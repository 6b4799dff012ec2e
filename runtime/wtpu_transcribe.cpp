// wtpu_transcribe: native end-to-end Whisper transcription on TPU via PJRT.
//
// The reference's native pipeline is coreml.mm + whisper.cpp-style host code:
// compiled graphs + device-resident buffers driven from C, with Python only
// for conversion. This is the TPU analog (SURVEY.md §2a): it consumes a
// directory produced by whisper_tpu.export.export_pipeline() —
//
//   encoder / cross_kv / fused_greedy StableHLO graphs (weights as inputs)
//   *.params.bin weight blobs, suppress/blank masks, tiktoken vocab,
//   pipeline.txt manifest
//
// — and runs audio decode -> log-mel -> encoder -> cross-KV -> fused greedy
// decode -> detokenization entirely in C++. Weights are uploaded to HBM once
// and stay device-resident across windows (the arrayXa/arrayCK analog);
// per-window data moves via device buffer handles, not host copies. Compiled
// executables are serialized to <dir>/.exe_cache so later runs skip XLA
// compilation (the analog of the reference's cached 1.5 s CoreML load).
//
// Usage:
//   wtpu_transcribe <pipeline_dir> <audio.{wav,flac}>
//       [--plugin /opt/axon/libaxon_pjrt.so] [--max-windows N] [--tokens]
//
// Build: make -C runtime wtpu_transcribe

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <zlib.h>

static double now_s() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + ts.tv_nsec * 1e-9;
}
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

// ---- C ABI from pjrt_runner.cpp / audioio.cpp (linked into this binary) ----
extern "C" {
const char* wtpu_pjrt_last_error();
const void* wtpu_pjrt_load(const char* plugin_path);
void* wtpu_pjrt_client_create(const void* api, const char** names,
                              const char** svals, const int64_t* ivals,
                              const int32_t* types, int32_t n);
int wtpu_pjrt_device_count(void* client);
void* wtpu_pjrt_compile(void* client, const char* mlir, int64_t mlir_size,
                        const char* opts, int64_t opts_size);
int64_t wtpu_pjrt_executable_serialize(void* client, void* exec, void* dst,
                                       int64_t cap);
void* wtpu_pjrt_executable_deserialize(void* client, const void* data,
                                       int64_t size);
void* wtpu_pjrt_buffer_from_host(void* client, const void* data,
                                 const int64_t* dims, int32_t ndims,
                                 int32_t type);
int wtpu_pjrt_execute_handles(void* client, void* exec, int32_t num_args,
                              void** arg_handles, int32_t num_outputs,
                              void** out_handles);
int wtpu_pjrt_buffer_to_host(void* client, void* buffer, void* dst,
                             int64_t capacity, const int64_t* dims,
                             int32_t ndims);
void wtpu_pjrt_buffer_destroy(void* client, void* buffer);
void wtpu_pjrt_executable_destroy(void* client, void* exec);
void wtpu_pjrt_client_destroy(void* client);

const char* audioio_last_error();
int audioio_decode(const char* path, int target_sr, float** out_samples,
                   int64_t* out_n);
int audioio_log_mel(const float* audio, int64_t n_samples, int n_mels,
                    int64_t padding, float** out, int64_t* out_frames);
void audioio_free(float* p);
}

namespace {

[[noreturn]] void die(const std::string& msg) {
  fprintf(stderr, "wtpu_transcribe: %s\n", msg.c_str());
  exit(1);
}

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

bool file_exists(const std::string& path) {
  std::ifstream f(path);
  return f.good();
}

// ---- spec.txt ----
struct TensorSpec {
  int pjrt_type = 0;
  std::string dtype;
  int64_t nbytes = 0;  // outputs only
  std::vector<int64_t> dims;
  int64_t elems() const {
    int64_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
};

struct GraphSpec {
  int n_params = 0;
  std::vector<TensorSpec> inputs;
  std::vector<TensorSpec> outputs;
};

GraphSpec parse_spec(const std::string& path) {
  std::ifstream f(path);
  if (!f) die("cannot read " + path);
  GraphSpec g;
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "n_params") {
      ss >> g.n_params;
    } else if (kind == "input" || kind == "output") {
      TensorSpec t;
      ss >> t.pjrt_type >> t.dtype;
      if (kind == "output") ss >> t.nbytes;
      int ndim = 0;
      ss >> ndim;
      t.dims.resize(ndim);
      for (int i = 0; i < ndim; i++) ss >> t.dims[i];
      (kind == "input" ? g.inputs : g.outputs).push_back(std::move(t));
    }
  }
  return g;
}

int64_t dtype_size(const std::string& d) {
  if (d == "float32" || d == "int32" || d == "uint32") return 4;
  if (d == "bfloat16" || d == "float16" || d == "int16") return 2;
  if (d == "float64" || d == "int64") return 8;
  if (d == "bool" || d == "int8" || d == "uint8") return 1;
  die("unknown dtype " + d);
}

// ---- pipeline.txt ----
struct Pipeline {
  int n_mels = 128;
  int sample_rate = 16000;
  int64_t n_vocab = 0, n_text_tokens = 0, eot = 0, timestamp_begin = 0;
  int sot_index = 0, sample_begin = 0, sample_len = 446, max_initial = 50;
  std::string tiktoken_file;
  std::vector<int32_t> initial_tokens;
};

Pipeline parse_pipeline(const std::string& path) {
  std::ifstream f(path);
  if (!f) die("cannot read " + path);
  Pipeline p;
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string key;
    ss >> key;
    if (key == "n_mels") ss >> p.n_mels;
    else if (key == "sample_rate") ss >> p.sample_rate;
    else if (key == "n_vocab") ss >> p.n_vocab;
    else if (key == "n_text_tokens") ss >> p.n_text_tokens;
    else if (key == "eot") ss >> p.eot;
    else if (key == "timestamp_begin") ss >> p.timestamp_begin;
    else if (key == "sot_index") ss >> p.sot_index;
    else if (key == "sample_begin") ss >> p.sample_begin;
    else if (key == "sample_len") ss >> p.sample_len;
    else if (key == "max_initial_ts_index") ss >> p.max_initial;
    else if (key == "tiktoken") ss >> p.tiktoken_file;
    else if (key == "initial_tokens") {
      int32_t t;
      while (ss >> t) p.initial_tokens.push_back(t);
    }
  }
  return p;
}

// ---- tiktoken vocab: "<base64 token bytes> <rank>" per line ----
std::vector<std::string> load_tiktoken(const std::string& path, int64_t n_text) {
  std::vector<std::string> table((size_t)n_text);
  int8_t inv[256];
  memset(inv, -1, sizeof(inv));
  const char* alphabet =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  for (int i = 0; i < 64; i++) inv[(uint8_t)alphabet[i]] = (int8_t)i;

  std::ifstream f(path);
  if (!f) die("cannot read " + path);
  std::string line;
  while (std::getline(f, line)) {
    size_t sp = line.find(' ');
    if (sp == std::string::npos) continue;
    long rank = strtol(line.c_str() + sp + 1, nullptr, 10);
    if (rank < 0 || rank >= n_text) continue;
    std::string bytes;
    uint32_t acc = 0;
    int nbits = 0;
    for (size_t i = 0; i < sp; i++) {
      int8_t v = inv[(uint8_t)line[i]];
      if (v < 0) continue;  // '=' padding
      acc = (acc << 6) | (uint32_t)v;
      nbits += 6;
      if (nbits >= 8) {
        nbits -= 8;
        bytes.push_back((char)((acc >> nbits) & 0xFF));
      }
    }
    table[(size_t)rank] = std::move(bytes);
  }
  return table;
}

// ---- PJRT helpers ----
struct Ctx {
  void* client = nullptr;
  std::string dir;
  std::string cache_dir;
};

uint64_t fnv1a(const std::string& s) {
  uint64_t h = 1469598103934665603ULL;
  for (unsigned char c : s) h = (h ^ c) * 1099511628211ULL;
  return h;
}

void* load_or_compile(Ctx& ctx, const std::string& name) {
  // the cache key includes the program hash so edited exports never load a
  // stale executable (feeding a mismatched arity crashes the device)
  std::string mlir_all = read_file(ctx.dir + "/" + name + ".mlir");
  char hex[20];
  snprintf(hex, sizeof(hex), "%016llx", (unsigned long long)fnv1a(mlir_all));
  std::string cache_path =
      ctx.cache_dir + "/" + name + "." + hex + ".pjrt_exe";
  if (file_exists(cache_path)) {
    std::string blob = read_file(cache_path);
    void* exec = wtpu_pjrt_executable_deserialize(ctx.client, blob.data(),
                                                  (int64_t)blob.size());
    if (exec) {
      fprintf(stderr, "[wtpu] %s: loaded from cache (%.1f MB)\n", name.c_str(),
              blob.size() / 1e6);
      return exec;
    }
    fprintf(stderr, "[wtpu] %s: stale cache (%s); recompiling\n", name.c_str(),
            wtpu_pjrt_last_error());
  }
  const std::string& mlir = mlir_all;
  std::string opts = read_file(ctx.dir + "/" + name + ".compile_options.pb");
  double t0 = now_s();
  void* exec = wtpu_pjrt_compile(ctx.client, mlir.data(), (int64_t)mlir.size(),
                                 opts.data(), (int64_t)opts.size());
  if (!exec) die(std::string("compile of ") + name + " failed: " +
                 wtpu_pjrt_last_error());
  fprintf(stderr, "[wtpu] %s: compiled in %.1f s\n", name.c_str(),
          now_s() - t0);
  int64_t n = wtpu_pjrt_executable_serialize(ctx.client, exec, nullptr, 0);
  if (n > 0) {
    std::vector<char> buf((size_t)n);
    if (wtpu_pjrt_executable_serialize(ctx.client, exec, buf.data(), n) == n) {
      std::ofstream f(cache_path, std::ios::binary);
      f.write(buf.data(), n);
    }
  }
  return exec;
}

// Upload the graph's weight blob as one device buffer per leaf (leaf shapes
// from the leading n_params input specs). Weights stay in HBM for the
// process lifetime.
std::vector<void*> upload_params(Ctx& ctx, const GraphSpec& spec,
                                 const std::string& blob_path) {
  std::string blob = read_file(blob_path);
  std::vector<void*> handles;
  size_t off = 0;
  for (int i = 0; i < spec.n_params; i++) {
    const TensorSpec& t = spec.inputs[(size_t)i];
    size_t nbytes = (size_t)(t.elems() * dtype_size(t.dtype));
    if (off + nbytes > blob.size()) die("params blob too small: " + blob_path);
    void* h = wtpu_pjrt_buffer_from_host(ctx.client, blob.data() + off,
                                         t.dims.data(), (int32_t)t.dims.size(),
                                         t.pjrt_type);
    if (!h) die(std::string("param upload failed: ") + wtpu_pjrt_last_error());
    handles.push_back(h);
    off += nbytes;
  }
  if (off != blob.size())
    fprintf(stderr, "[wtpu] warning: %zu trailing bytes in %s\n",
            blob.size() - off, blob_path.c_str());
  return handles;
}

void* upload(Ctx& ctx, const void* data, const TensorSpec& t) {
  void* h = wtpu_pjrt_buffer_from_host(ctx.client, data, t.dims.data(),
                                       (int32_t)t.dims.size(), t.pjrt_type);
  if (!h) die(std::string("upload failed: ") + wtpu_pjrt_last_error());
  return h;
}

struct Graph {
  void* exec = nullptr;
  GraphSpec spec;
  std::vector<void*> params;  // device handles for the leading inputs
};

// Run with params + the given runtime handles; returns output handles.
std::vector<void*> run(Ctx& ctx, Graph& g, const std::vector<void*>& rt) {
  std::vector<void*> args = g.params;
  args.insert(args.end(), rt.begin(), rt.end());
  if ((int)args.size() != (int)g.spec.inputs.size()) die("arity mismatch");
  std::vector<void*> outs(g.spec.outputs.size(), nullptr);
  if (wtpu_pjrt_execute_handles(ctx.client, g.exec, (int32_t)args.size(),
                                args.data(), (int32_t)outs.size(),
                                outs.data()) != 0)
    die(std::string("execute failed: ") + wtpu_pjrt_last_error());
  return outs;
}

}  // namespace

namespace {

// ---- engine: loaded graphs + device-resident weights + const inputs ----
struct Engine {
  Ctx ctx;
  Pipeline p;
  std::vector<std::string> vocab;
  Graph enc, ckv, dec_greedy, dec_beam;
  bool have_beam = false;
  // loop-invariant runtime input handles (shared by both decode graphs)
  void *h_toks, *h_sb, *h_sot, *h_sup, *h_blk, *h_mx, *h_slen, *h_temp, *h_seed;
  int32_t sb = 0;
};

void engine_init(Engine& e, const std::string& dir, const std::string& plugin,
                 bool load_greedy, bool load_beam) {
  e.p = parse_pipeline(dir + "/pipeline.txt");
  e.vocab = load_tiktoken(dir + "/" + e.p.tiktoken_file, e.p.n_text_tokens);

  e.ctx.dir = dir;
  e.ctx.cache_dir = dir + "/.exe_cache";
  std::string mkdir_cmd = "mkdir -p '" + e.ctx.cache_dir + "'";
  if (system(mkdir_cmd.c_str()) != 0) die("cannot create cache dir");
  // axon-tunnel quirks (a real TPU VM's libtpu needs none of these): the
  // Python side gets them from the baked sitecustomize; replicate its
  // contract for plugin-only processes.
  if (getenv("PALLAS_AXON_POOL_IPS")) {
    setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
    setenv("AXON_LOOPBACK_RELAY", "1", 0);
    setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
    setenv("AXON_COMPAT_VERSION", "49", 0);  // axon.register.COMPAT_VERSION
  }
  const void* api = wtpu_pjrt_load(plugin.c_str());
  if (!api) die(std::string("plugin load failed: ") + wtpu_pjrt_last_error());
  char session_id[64];
  snprintf(session_id, sizeof(session_id), "wtpu-%ld-%d", (long)time(nullptr),
           (int)(rand() % 100000));
  const char* gen = getenv("PALLAS_AXON_TPU_GEN");
  std::string topology = std::string(gen ? gen : "v5e") + ":1x1x1";
  const char* names[] = {"topology", "session_id", "remote_compile"};
  const char* svals[] = {topology.c_str(), session_id, ""};
  const char* rc = getenv("PALLAS_AXON_REMOTE_COMPILE");
  int64_t ivals[] = {0, 0, (rc && strcmp(rc, "1") == 0) ? 1 : 0};
  int32_t types[] = {0, 0, 2};
  e.ctx.client = wtpu_pjrt_client_create(api, names, svals, ivals, types, 3);
  if (!e.ctx.client)
    die(std::string("client create failed: ") + wtpu_pjrt_last_error());
  fprintf(stderr, "[wtpu] client up, %d device(s)\n",
          wtpu_pjrt_device_count(e.ctx.client));

  e.enc.spec = parse_spec(dir + "/encoder.spec.txt");
  e.ckv.spec = parse_spec(dir + "/cross_kv.spec.txt");
  e.enc.exec = load_or_compile(e.ctx, "encoder");
  e.ckv.exec = load_or_compile(e.ctx, "cross_kv");
  e.enc.params = upload_params(e.ctx, e.enc.spec, dir + "/encoder.params.bin");
  e.ckv.params = upload_params(e.ctx, e.ckv.spec, dir + "/decoder.params.bin");
  if (load_greedy) {
    e.dec_greedy.spec = parse_spec(dir + "/fused_greedy.spec.txt");
    e.dec_greedy.exec = load_or_compile(e.ctx, "fused_greedy");
    // bf16 export: the fused graphs consume the cross_kv decoder blob —
    // reuse its device handles. int8 export (export.py weights="int8"):
    // the fused graphs take a quantized tree with extra @scale leaves
    // (detectable as a different param count), shipped in their own blob.
    if (e.dec_greedy.spec.n_params == e.ckv.spec.n_params)
      e.dec_greedy.params = e.ckv.params;  // same decoder blob, same handles
    else
      e.dec_greedy.params = upload_params(e.ctx, e.dec_greedy.spec,
                                          dir + "/fused_greedy.params.bin");
  }
  if (load_beam) {
    e.dec_beam.spec = parse_spec(dir + "/fused_beam.spec.txt");
    e.dec_beam.exec = load_or_compile(e.ctx, "fused_beam");
    if (e.dec_beam.spec.n_params == e.ckv.spec.n_params)
      e.dec_beam.params = e.ckv.params;
    else if (load_greedy &&
             e.dec_beam.spec.n_params == e.dec_greedy.spec.n_params)
      e.dec_beam.params = e.dec_greedy.params;  // fused blobs are shared
    else
      e.dec_beam.params = upload_params(e.ctx, e.dec_beam.spec,
                                        dir + "/fused_beam.params.bin");
    e.have_beam = true;
  }

  // loop-invariant runtime inputs (input order after params: initial_tokens,
  // sample_begin, ck, cv, sot_index, suppress, blank, max_initial,
  // sample_len, temperature, rng_seed)
  const GraphSpec& ds = load_greedy ? e.dec_greedy.spec : e.dec_beam.spec;
  const auto& din = ds.inputs;
  int base = ds.n_params;
  std::vector<int32_t> toks((size_t)din[(size_t)base].elems(), 0);
  for (size_t i = 0; i < e.p.initial_tokens.size(); i++)
    toks[i] = e.p.initial_tokens[i];
  std::string smask = read_file(dir + "/suppress_mask.bin");
  std::string bmask = read_file(dir + "/blank_mask.bin");
  e.sb = e.p.sample_begin;
  int32_t sot = e.p.sot_index, mx = e.p.max_initial, slen = e.p.sample_len,
          seed = 0;
  float temp = 0.0f;
  e.h_toks = upload(e.ctx, toks.data(), din[(size_t)base]);
  e.h_sb = upload(e.ctx, &e.sb, din[(size_t)base + 1]);
  e.h_sot = upload(e.ctx, &sot, din[(size_t)base + 4]);
  e.h_sup = upload(e.ctx, smask.data(), din[(size_t)base + 5]);
  e.h_blk = upload(e.ctx, bmask.data(), din[(size_t)base + 6]);
  e.h_mx = upload(e.ctx, &mx, din[(size_t)base + 7]);
  e.h_slen = upload(e.ctx, &slen, din[(size_t)base + 8]);
  e.h_temp = upload(e.ctx, &temp, din[(size_t)base + 9]);
  e.h_seed = upload(e.ctx, &seed, din[(size_t)base + 10]);
}

// ---- one window decode: run the graph chain, select the output sequence ----
struct WindowResult {
  std::vector<int32_t> seq;  // sampled tokens, eot excluded
  double sum_lp = 0.0;       // cumulative logprob of the selected sequence
  double no_speech = 0.0;
};

WindowResult decode_window(Engine& e, bool beam, void* h_ck, void* h_cv,
                           float temperature, int32_t seed) {
  Graph& dec = (beam && temperature == 0.0f) ? e.dec_beam : e.dec_greedy;
  const bool use_beam = beam && temperature == 0.0f;
  const Pipeline& p = e.p;
  Ctx& ctx = e.ctx;
  const int32_t sb = e.sb;
  const auto& din = dec.spec.inputs;
  int base = dec.spec.n_params;

  void* h_temp = e.h_temp;
  void* h_seed = e.h_seed;
  bool own_scalars = temperature != 0.0f || seed != 0;
  if (own_scalars) {
    h_temp = upload(ctx, &temperature, din[(size_t)base + 9]);
    h_seed = upload(ctx, &seed, din[(size_t)base + 10]);
  }
  std::vector<void*> out =
      run(ctx, dec,
          {e.h_toks, e.h_sb, h_ck, h_cv, e.h_sot, e.h_sup, e.h_blk, e.h_mx,
           e.h_slen, h_temp, h_seed});
  if (own_scalars) {
    wtpu_pjrt_buffer_destroy(ctx.client, h_temp);
    wtpu_pjrt_buffer_destroy(ctx.client, h_seed);
  }

  // outputs: tokens (G,448) i32, n_tokens i32, sum_logprobs (G,) f32,
  // no_speech (A,) f32, ftok (A,MC,449) i32, fscore, flen, fcount
  auto fetch_i32 = [&](void* h, int32_t* dst, int64_t n, const TensorSpec& t) {
    if (wtpu_pjrt_buffer_to_host(ctx.client, h, dst, n * 4, t.dims.data(),
                                 (int32_t)t.dims.size()))
      die(std::string("fetch failed: ") + wtpu_pjrt_last_error());
  };
  auto fetch_f32 = [&](void* h, float* dst, int64_t n, const TensorSpec& t) {
    if (wtpu_pjrt_buffer_to_host(ctx.client, h, dst, n * 4, t.dims.data(),
                                 (int32_t)t.dims.size()))
      die(std::string("fetch failed: ") + wtpu_pjrt_last_error());
  };
  std::vector<int32_t> out_toks((size_t)dec.spec.outputs[0].elems());
  int32_t n_tokens = 0;
  float no_speech = 0.0f;
  fetch_i32(out[0], out_toks.data(), (int64_t)out_toks.size(),
            dec.spec.outputs[0]);
  fetch_i32(out[1], &n_tokens, 1, dec.spec.outputs[1]);
  fetch_f32(out[3], &no_speech, 1, dec.spec.outputs[3]);

  WindowResult res;
  res.no_speech = no_speech;
  if (!use_beam) {
    std::vector<float> slp((size_t)dec.spec.outputs[2].elems());
    fetch_f32(out[2], slp.data(), (int64_t)slp.size(), dec.spec.outputs[2]);
    res.sum_lp = slp[0];
    for (int32_t i = sb; i < n_tokens; i++) {
      int32_t t = out_toks[(size_t)i];
      if (t == (int32_t)p.eot) break;
      res.seq.push_back(t);
    }
  } else {
    // the reference's finalize + MaximumLikelihoodRanker
    // (decoding.py:369-398, 215-234): finished candidates (cumulative
    // logprob) topped up with live beams by sum_logprob, ranked by
    // score / sampled_length (length_penalty None)
    int64_t G = dec.spec.outputs[0].dims[0];
    int64_t MC = dec.spec.outputs[4].dims[1];
    int64_t FT = dec.spec.outputs[4].dims[2];
    std::vector<float> slp((size_t)G);
    std::vector<int32_t> ftok((size_t)(MC * FT));
    std::vector<float> fscore((size_t)MC);
    std::vector<int32_t> flen((size_t)MC);
    int32_t fcount = 0;
    fetch_f32(out[2], slp.data(), G, dec.spec.outputs[2]);
    fetch_i32(out[4], ftok.data(), MC * FT, dec.spec.outputs[4]);
    fetch_f32(out[5], fscore.data(), MC, dec.spec.outputs[5]);
    fetch_i32(out[6], flen.data(), MC, dec.spec.outputs[6]);
    fetch_i32(out[7], &fcount, 1, dec.spec.outputs[7]);

    struct Cand {
      std::vector<int32_t> seq;
      double score;
    };
    std::vector<Cand> cands;
    for (int32_t i = 0; i < fcount; i++) {
      Cand c;
      for (int32_t j = sb; j < flen[(size_t)i] - 1; j++)  // drop trailing eot
        c.seq.push_back(ftok[(size_t)(i * FT + j)]);
      c.score = fscore[(size_t)i];
      cands.push_back(std::move(c));
    }
    if ((int64_t)cands.size() < G) {
      std::vector<int> order((size_t)G);
      for (int b = 0; b < (int)G; b++) order[(size_t)b] = b;
      for (size_t a = 0; a < order.size(); a++)  // stable desc by sum_logprob
        for (size_t b = a + 1; b < order.size(); b++)
          if (slp[(size_t)order[b]] > slp[(size_t)order[a]])
            std::swap(order[a], order[b]);
      for (int b : order) {
        if ((int64_t)cands.size() >= G) break;
        Cand c;
        for (int32_t j = sb; j < n_tokens; j++)
          c.seq.push_back(
              out_toks[(size_t)(b * dec.spec.outputs[0].dims[1] + j)]);
        c.score = slp[(size_t)b];
        cands.push_back(std::move(c));
      }
    }
    size_t best = 0;
    double best_score = -1e30;
    for (size_t i = 0; i < cands.size(); i++) {
      double len = cands[i].seq.size() > 0 ? (double)cands[i].seq.size() : 1.0;
      double s = cands[i].score / len;
      if (s > best_score) {
        best_score = s;
        best = i;
      }
    }
    if (!cands.empty()) {
      res.seq = cands[best].seq;
      res.sum_lp = cands[best].score;
    }
  }
  for (void* h : out) wtpu_pjrt_buffer_destroy(ctx.client, h);
  return res;
}

double compression_ratio(const std::string& text) {
  if (text.empty()) return 0.0;
  uLongf cap = compressBound((uLong)text.size());
  std::vector<Bytef> buf((size_t)cap);
  if (compress(buf.data(), &cap, (const Bytef*)text.data(),
               (uLong)text.size()) != Z_OK)
    return 0.0;
  return (double)text.size() / (double)cap;
}

// Transcribe one file; returns false + *err on failure (the engine survives).
// Applies the reference's temperature-fallback ladder + quality gates
// (transcribe.py:188-228: compression_ratio > 2.4 or avg_logprob < -1.0 ->
// retry at higher temperature; no-speech windows are skipped).
bool transcribe_file(Engine& e, const std::string& audio_path, bool beam,
                     int max_windows, bool print_tokens, std::string* text_out,
                     std::vector<int32_t>* tokens_out, std::string* err,
                     bool no_fallback = false) {
  if (beam && !e.have_beam) {
    *err = "beam graph not loaded";
    return false;
  }
  if (!beam && !e.dec_greedy.exec) {
    *err = "greedy graph not loaded";
    return false;
  }
  const Pipeline& p = e.p;
  Ctx& ctx = e.ctx;

  float* samples = nullptr;
  int64_t n_samples = 0;
  if (audioio_decode(audio_path.c_str(), p.sample_rate, &samples, &n_samples)) {
    *err = std::string("audio decode failed: ") + audioio_last_error();
    return false;
  }
  float* mel = nullptr;
  int64_t n_frames = 0;
  if (audioio_log_mel(samples, n_samples, p.n_mels, 480000, &mel, &n_frames)) {
    audioio_free(samples);
    *err = std::string("log-mel failed: ") + audioio_last_error();
    return false;
  }
  int64_t content_frames = n_frames - 3000;
  fprintf(stderr, "[wtpu] %s: %.1f s audio, %lld mel frames\n",
          audio_path.c_str(), (double)n_samples / p.sample_rate,
          (long long)content_frames);

  static const float kTemps[] = {0.0f, 0.2f, 0.4f, 0.6f, 0.8f, 1.0f};
  const double kCompressionThreshold = 2.4;
  const double kLogprobThreshold = -1.0;
  const double kNoSpeechThreshold = 0.6;

  std::vector<float> window((size_t)p.n_mels * 3000);
  std::string text;
  int64_t seek = 0;
  int n_windows = 0;
  double t_loop = now_s();
  while (seek < content_frames && n_windows < max_windows) {
    for (int m = 0; m < p.n_mels; m++)
      memcpy(window.data() + (size_t)m * 3000, mel + m * n_frames + seek,
             3000 * sizeof(float));
    void* h_mel = upload(ctx, window.data(),
                         e.enc.spec.inputs[(size_t)e.enc.spec.n_params]);
    std::vector<void*> xa = run(ctx, e.enc, {h_mel});
    std::vector<void*> kv = run(ctx, e.ckv, {xa[0]});

    WindowResult res;
    double avg_lp = 0.0;
    std::string wtext;
    size_t n_temps = no_fallback ? 1 : sizeof(kTemps) / sizeof(kTemps[0]);
    for (size_t ti = 0; ti < n_temps; ti++) {
      float t = kTemps[ti];
      res = decode_window(e, beam, kv[0], kv[1], t,
                          t > 0 ? (int32_t)(n_windows * 6 + (int)ti) : 0);
      wtext.clear();
      for (int32_t tok : res.seq)
        if (tok < (int32_t)p.n_text_tokens) wtext += e.vocab[(size_t)tok];
      avg_lp = res.sum_lp / (double)(res.seq.size() + 1);
      bool needs_fallback =
          compression_ratio(wtext) > kCompressionThreshold ||
          avg_lp < kLogprobThreshold;
      if (res.no_speech > kNoSpeechThreshold && avg_lp < kLogprobThreshold)
        needs_fallback = false;  // silence: accept and skip below
      if (!needs_fallback) break;
      if (ti + 1 < n_temps)
        fprintf(stderr, "[wtpu] window %d: fallback to t=%.1f\n", n_windows,
                kTemps[ti + 1]);
    }

    for (void* h : xa) wtpu_pjrt_buffer_destroy(ctx.client, h);
    for (void* h : kv) wtpu_pjrt_buffer_destroy(ctx.client, h);
    wtpu_pjrt_buffer_destroy(ctx.client, h_mel);

    if (res.no_speech > kNoSpeechThreshold && avg_lp < kLogprobThreshold) {
      fprintf(stderr, "[wtpu] window %d @%.1fs: no speech (p=%.2f), skipped\n",
              n_windows, seek / 100.0, res.no_speech);
      seek += 3000;
      n_windows++;
      continue;
    }

    int64_t last_ts = -1;
    for (int32_t t : res.seq) {
      if (print_tokens) fprintf(stderr, "%d ", t);
      if (t >= (int32_t)p.timestamp_begin) last_ts = t - (int64_t)p.timestamp_begin;
      if (tokens_out) tokens_out->push_back(t);
    }
    if (print_tokens) fprintf(stderr, "\n");
    text += wtext;
    fprintf(stderr, "[wtpu] window %d @%.1fs: %zu tokens (avg_lp %.2f)\n",
            n_windows, seek / 100.0, res.seq.size(), avg_lp);

    // each timestamp unit is 20 ms = 2 mel frames
    seek += (last_ts > 0) ? last_ts * 2 : 3000;
    n_windows++;
  }
  double loop_s = now_s() - t_loop;
  fprintf(stderr, "[wtpu] %d window(s) in %.2f s (%.1fx RT)\n", n_windows,
          loop_s, (double)n_samples / p.sample_rate / (loop_s > 0 ? loop_s : 1));
  audioio_free(samples);
  audioio_free(mel);
  *text_out = text;
  return true;
}

std::string json_escape(const std::string& s) {
  std::string o;
  for (unsigned char c : s) {
    if (c == '"' || c == '\\') { o += '\\'; o += (char)c; }
    else if (c == '\n') o += "\\n";
    else if (c < 0x20) { char b[8]; snprintf(b, sizeof(b), "\\u%04x", c); o += b; }
    else o += (char)c;
  }
  return o;
}

}  // namespace

#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

namespace {

// Daemon mode: a unix-socket transcription service (the serving analog the
// single-shot reference lacks). Protocol: one request line per connection,
//   <audio_path> [beam]\n
// response: one JSON line {"text": ..., "tokens": [...]} or {"error": ...}.
int serve(Engine& e, const std::string& sock_path) {
  unlink(sock_path.c_str());
  int fd = socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd < 0) die("socket() failed");
  sockaddr_un addr;
  memset(&addr, 0, sizeof(addr));
  addr.sun_family = AF_UNIX;
  strncpy(addr.sun_path, sock_path.c_str(), sizeof(addr.sun_path) - 1);
  if (bind(fd, (sockaddr*)&addr, sizeof(addr)) != 0) die("bind() failed");
  if (listen(fd, 8) != 0) die("listen() failed");
  fprintf(stderr, "[wtpu] serving on %s\n", sock_path.c_str());
  for (;;) {
    int c = accept(fd, nullptr, nullptr);
    if (c < 0) continue;
    std::string req;
    char buf[512];
    ssize_t n;
    while ((n = read(c, buf, sizeof(buf))) > 0) {
      req.append(buf, (size_t)n);
      if (req.find('\n') != std::string::npos) break;
    }
    size_t nl = req.find('\n');
    if (nl != std::string::npos) req.resize(nl);
    while (!req.empty() && (req.back() == '\r' || req.back() == ' ')) req.pop_back();
    bool beam = false;
    size_t sp = req.rfind(' ');
    if (sp != std::string::npos && req.substr(sp + 1) == "beam") {
      beam = true;
      req.resize(sp);
    }
    std::string text, err, resp;
    std::vector<int32_t> toks;
    if (req == "shutdown") {
      resp = "{\"ok\": true}\n";
      (void)!write(c, resp.data(), resp.size());
      close(c);
      break;
    }
    if (transcribe_file(e, req, beam, 1 << 30, false, &text, &toks, &err)) {
      resp = "{\"text\": \"" + json_escape(text) + "\", \"tokens\": [";
      for (size_t i = 0; i < toks.size(); i++) {
        if (i) resp += ",";
        resp += std::to_string(toks[i]);
      }
      resp += "]}\n";
    } else {
      resp = "{\"error\": \"" + json_escape(err) + "\"}\n";
    }
    (void)!write(c, resp.data(), resp.size());
    close(c);
  }
  close(fd);
  unlink(sock_path.c_str());
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  std::string dir, audio_path, serve_path;
  int max_windows = 1 << 30;
  bool print_tokens = false;
  bool beam = false;
  bool no_fallback = false;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--plugin" && i + 1 < argc) plugin = argv[++i];
    else if (a == "--max-windows" && i + 1 < argc) max_windows = atoi(argv[++i]);
    else if (a == "--tokens") print_tokens = true;
    else if (a == "--beam") beam = true;
    else if (a == "--serve" && i + 1 < argc) serve_path = argv[++i];
    else if (a == "--no-fallback") no_fallback = true;  // pin t=0 (parity tests)
    else if (dir.empty()) dir = a;
    else audio_path = a;
  }
  if (dir.empty() || (audio_path.empty() && serve_path.empty()))
    die("usage: wtpu_transcribe <pipeline_dir> <audio> [--plugin SO] "
        "[--max-windows N] [--tokens] [--beam] | <pipeline_dir> --serve SOCK");

  Engine e;
  if (!serve_path.empty()) {
    engine_init(e, dir, plugin, /*greedy=*/true, /*beam=*/true);
    return serve(e, serve_path);
  }
  engine_init(e, dir, plugin, /*greedy=*/true, /*beam=*/beam);
  std::string text, err;
  if (!transcribe_file(e, audio_path, beam, max_windows, print_tokens, &text,
                       nullptr, &err, no_fallback))
    die(err);
  printf("%s\n", text.c_str());
  return 0;
}
