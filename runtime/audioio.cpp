// audioio: native audio decode + resample frontend for whisper_tpu.
//
// Plays the role ffmpeg plays for the reference implementation
// (/root/reference/whisper/audio.py:25-62): open a media file, decode to
// mono float32 PCM at a target sample rate. Implemented natively so the
// framework has no external-process dependency: a self-contained WAV
// (PCM16/24/32/float) reader, a FLAC decoder (constant / verbatim / fixed /
// LPC subframes, Rice residuals, all stereo decorrelation modes, up to
// 32-bit samples), channel downmix, and a Kaiser-windowed sinc resampler.
//
// C ABI (see whisper_tpu/runtime/native.py for the ctypes bindings):
//   audioio_decode(path, target_sr, &samples, &n) -> 0 on success
//   audioio_free(samples)
//   audioio_last_error() -> message for the calling thread's last failure

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }

// ---------------------------------------------------------------------------
// Bit reader (MSB-first, as used by FLAC)
// ---------------------------------------------------------------------------

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size) : data_(data), size_(size) {}

  bool eof() const { return byte_pos_ >= size_ && bit_pos_ == 0; }
  size_t byte_position() const { return byte_pos_; }

  void align_to_byte() {
    if (bit_pos_ != 0) {
      bit_pos_ = 0;
      byte_pos_++;
    }
  }

  // Read up to 32 bits, MSB first. Returns false past end of stream.
  bool read_bits(int n, uint32_t* out) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
      if (byte_pos_ >= size_) return false;
      uint32_t bit = (data_[byte_pos_] >> (7 - bit_pos_)) & 1u;
      v = (v << 1) | bit;
      if (++bit_pos_ == 8) {
        bit_pos_ = 0;
        byte_pos_++;
      }
    }
    *out = v;
    return true;
  }

  bool read_bits64(int n, uint64_t* out) {
    uint64_t v = 0;
    for (int i = 0; i < n; i++) {
      if (byte_pos_ >= size_) return false;
      uint64_t bit = (data_[byte_pos_] >> (7 - bit_pos_)) & 1u;
      v = (v << 1) | bit;
      if (++bit_pos_ == 8) {
        bit_pos_ = 0;
        byte_pos_++;
      }
    }
    *out = v;
    return true;
  }

  // Signed two's-complement read.
  bool read_signed(int n, int64_t* out) {
    uint64_t raw;
    if (!read_bits64(n, &raw)) return false;
    if (n > 0 && (raw >> (n - 1)) & 1u) {
      raw |= ~((uint64_t(1) << n) - 1);  // sign-extend
    }
    *out = (int64_t)raw;
    return true;
  }

  // Unary-coded value: count of 0 bits before the terminating 1.
  bool read_unary(uint32_t* out) {
    uint32_t count = 0;
    while (true) {
      if (byte_pos_ >= size_) return false;
      uint32_t bit = (data_[byte_pos_] >> (7 - bit_pos_)) & 1u;
      if (++bit_pos_ == 8) {
        bit_pos_ = 0;
        byte_pos_++;
      }
      if (bit) break;
      count++;
      if (count > (1u << 24)) return false;  // corrupt stream guard
    }
    *out = count;
    return true;
  }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t byte_pos_ = 0;
  int bit_pos_ = 0;
};

struct DecodedAudio {
  std::vector<float> samples;  // interleaved
  std::vector<int32_t> raw;    // interleaved integer samples (FLAC/WAV PCM)
  int channels = 0;
  int sample_rate = 0;
  int bits_per_sample = 0;
  uint8_t md5[16] = {0};  // STREAMINFO md5 (FLAC only), all-zero if absent
  bool keep_raw = false;
};

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------

bool decode_wav(const std::vector<uint8_t>& file, DecodedAudio* out) {
  if (file.size() < 44 || memcmp(file.data(), "RIFF", 4) != 0 ||
      memcmp(file.data() + 8, "WAVE", 4) != 0) {
    set_error("not a RIFF/WAVE file");
    return false;
  }
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data_chunk = nullptr;
  size_t data_size = 0;

  auto rd16 = [&](size_t p) { return (uint16_t)(file[p] | (file[p + 1] << 8)); };
  auto rd32 = [&](size_t p) {
    return (uint32_t)(file[p] | (file[p + 1] << 8) | (file[p + 2] << 16) |
                      ((uint32_t)file[p + 3] << 24));
  };

  while (pos + 8 <= file.size()) {
    uint32_t chunk_size = rd32(pos + 4);
    if (memcmp(file.data() + pos, "fmt ", 4) == 0 && pos + 8 + 16 <= file.size()) {
      fmt = rd16(pos + 8);
      channels = rd16(pos + 10);
      rate = rd32(pos + 12);
      bits = rd16(pos + 22);
      if (fmt == 0xFFFE && chunk_size >= 40) fmt = rd16(pos + 8 + 24);  // extensible
    } else if (memcmp(file.data() + pos, "data", 4) == 0) {
      data_chunk = file.data() + pos + 8;
      data_size = std::min((size_t)chunk_size, file.size() - pos - 8);
    }
    pos += 8 + chunk_size + (chunk_size & 1);
  }
  if (!data_chunk || channels == 0 || rate == 0) {
    set_error("WAV: missing fmt/data chunk");
    return false;
  }

  size_t bytes_per_sample = bits / 8;
  if (bytes_per_sample == 0) {
    set_error("WAV: bad bit depth");
    return false;
  }
  size_t n = data_size / bytes_per_sample;
  out->samples.resize(n);
  out->channels = channels;
  out->sample_rate = (int)rate;

  if (fmt == 1 && bits == 16) {
    for (size_t i = 0; i < n; i++) {
      int16_t v = (int16_t)(data_chunk[2 * i] | (data_chunk[2 * i + 1] << 8));
      out->samples[i] = v / 32768.0f;
    }
  } else if (fmt == 1 && bits == 24) {
    for (size_t i = 0; i < n; i++) {
      int32_t v = data_chunk[3 * i] | (data_chunk[3 * i + 1] << 8) |
                  (data_chunk[3 * i + 2] << 16);
      if (v & 0x800000) v |= ~0xFFFFFF;
      out->samples[i] = v / 8388608.0f;
    }
  } else if (fmt == 1 && bits == 32) {
    for (size_t i = 0; i < n; i++) {
      int32_t v;
      memcpy(&v, data_chunk + 4 * i, 4);
      out->samples[i] = (float)(v / 2147483648.0);
    }
  } else if (fmt == 3 && bits == 32) {
    for (size_t i = 0; i < n; i++) {
      float v;
      memcpy(&v, data_chunk + 4 * i, 4);
      out->samples[i] = v;
    }
  } else {
    set_error("WAV: unsupported format " + std::to_string(fmt) + "/" +
              std::to_string(bits) + "bit");
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// FLAC
// ---------------------------------------------------------------------------

// Decode a UTF-8-style coded number (FLAC frame/sample index).
bool read_utf8_coded(BitReader* br, uint64_t* out) {
  uint32_t b0;
  if (!br->read_bits(8, &b0)) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    *out = b0;
    return true;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < extra; i++) {
    uint32_t b;
    if (!br->read_bits(8, &b)) return false;
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

// Rice-coded residual partition decode into res[0..n)
bool read_residual(BitReader* br, int predictor_order, int block_size,
                   std::vector<int64_t>* res) {
  uint32_t method;
  if (!br->read_bits(2, &method)) return false;
  if (method > 1) {
    set_error("FLAC: reserved residual method");
    return false;
  }
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 15 : 31;

  uint32_t partition_order;
  if (!br->read_bits(4, &partition_order)) return false;
  int partitions = 1 << partition_order;
  if (block_size % partitions != 0) {
    set_error("FLAC: invalid partition order");
    return false;
  }
  int samples_per_partition = block_size >> partition_order;

  res->resize(block_size - predictor_order);
  int idx = 0;
  for (int p = 0; p < partitions; p++) {
    int count = samples_per_partition - (p == 0 ? predictor_order : 0);
    uint32_t param;
    if (!br->read_bits(param_bits, &param)) return false;
    if (param == escape) {
      uint32_t raw_bits;
      if (!br->read_bits(5, &raw_bits)) return false;
      for (int i = 0; i < count; i++) {
        int64_t v = 0;
        if (raw_bits > 0) {
          if (!br->read_signed((int)raw_bits, &v)) return false;
        }
        (*res)[idx++] = v;
      }
    } else {
      for (int i = 0; i < count; i++) {
        uint32_t q;
        if (!br->read_unary(&q)) return false;
        uint32_t r = 0;
        if (param > 0 && !br->read_bits((int)param, &r)) return false;
        uint64_t u = ((uint64_t)q << param) | r;
        // zigzag decode
        (*res)[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
  }
  return true;
}

bool decode_subframe(BitReader* br, int block_size, int bps,
                     std::vector<int64_t>* out) {
  uint32_t pad;
  if (!br->read_bits(1, &pad) || pad != 0) {
    set_error("FLAC: bad subframe padding bit");
    return false;
  }
  uint32_t type;
  if (!br->read_bits(6, &type)) return false;
  uint32_t wasted_flag;
  if (!br->read_bits(1, &wasted_flag)) return false;
  int wasted = 0;
  if (wasted_flag) {
    uint32_t u;
    if (!br->read_unary(&u)) return false;
    wasted = (int)u + 1;
  }
  int eff_bps = bps - wasted;

  out->assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v;
    if (!br->read_signed(eff_bps, &v)) return false;
    for (int i = 0; i < block_size; i++) (*out)[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) {
      if (!br->read_signed(eff_bps, &(*out)[i])) return false;
    }
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0..4
    int order = (int)type - 8;
    for (int i = 0; i < order; i++) {
      if (!br->read_signed(eff_bps, &(*out)[i])) return false;
    }
    std::vector<int64_t> res;
    if (!read_residual(br, order, block_size, &res)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t r = res[i - order];
      int64_t* s = out->data() + i;
      switch (order) {
        case 0: *s = r; break;
        case 1: *s = r + s[-1]; break;
        case 2: *s = r + 2 * s[-1] - s[-2]; break;
        case 3: *s = r + 3 * s[-1] - 3 * s[-2] + s[-3]; break;
        case 4: *s = r + 4 * s[-1] - 6 * s[-2] + 4 * s[-3] - s[-4]; break;
      }
    }
  } else if (type >= 32) {  // LPC, order 1..32
    int order = (int)(type & 0x1F) + 1;
    for (int i = 0; i < order; i++) {
      if (!br->read_signed(eff_bps, &(*out)[i])) return false;
    }
    uint32_t prec_raw;
    if (!br->read_bits(4, &prec_raw)) return false;
    if (prec_raw == 15) {
      set_error("FLAC: invalid LPC precision");
      return false;
    }
    int precision = (int)prec_raw + 1;
    int64_t shift;
    if (!br->read_signed(5, &shift)) return false;
    if (shift < 0) {
      set_error("FLAC: negative LPC shift");
      return false;
    }
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; i++) {
      if (!br->read_signed(precision, &coefs[i])) return false;
    }
    std::vector<int64_t> res;
    if (!read_residual(br, order, block_size, &res)) return false;
    for (int i = order; i < block_size; i++) {
      __int128 acc = 0;
      for (int j = 0; j < order; j++) {
        acc += (__int128)coefs[j] * (*out)[i - 1 - j];
      }
      (*out)[i] = res[i - order] + (int64_t)(acc >> shift);
    }
  } else {
    set_error("FLAC: reserved subframe type");
    return false;
  }

  if (wasted > 0) {
    for (int i = 0; i < block_size; i++) (*out)[i] <<= wasted;
  }
  return true;
}

bool decode_flac(const std::vector<uint8_t>& file, DecodedAudio* out) {
  if (file.size() < 8 || memcmp(file.data(), "fLaC", 4) != 0) {
    set_error("not a FLAC file");
    return false;
  }

  // --- metadata blocks; we only need STREAMINFO ---
  size_t pos = 4;
  int stream_sr = 0, stream_channels = 0, stream_bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  while (!last) {
    if (pos + 4 > file.size()) {
      set_error("FLAC: truncated metadata");
      return false;
    }
    uint8_t hdr = file[pos];
    last = (hdr & 0x80) != 0;
    int btype = hdr & 0x7F;
    uint32_t blen = ((uint32_t)file[pos + 1] << 16) | ((uint32_t)file[pos + 2] << 8) |
                    file[pos + 3];
    if (pos + 4 + blen > file.size()) {
      set_error("FLAC: truncated metadata block");
      return false;
    }
    if (btype == 0 && blen >= 34) {
      const uint8_t* si = file.data() + pos + 4;
      uint64_t packed = 0;
      for (int i = 10; i < 18; i++) packed = (packed << 8) | si[i];
      stream_sr = (int)(packed >> 44);
      stream_channels = (int)((packed >> 41) & 0x7) + 1;
      stream_bps = (int)((packed >> 36) & 0x1F) + 1;
      total_samples = packed & ((uint64_t(1) << 36) - 1);
      memcpy(out->md5, si + 18, 16);
    }
    pos += 4 + blen;
  }
  if (stream_sr == 0) {
    set_error("FLAC: missing STREAMINFO");
    return false;
  }

  out->channels = stream_channels;
  out->sample_rate = stream_sr;
  if (total_samples > 0) {
    out->samples.reserve((size_t)total_samples * stream_channels);
  }

  static const int kBlockSizes[16] = {0,    192,  576,   1152, 2304, 4608, -1, -2,
                                      256,  512,  1024,  2048, 4096, 8192, 16384, 32768};
  static const int kSampleRates[16] = {0,     88200, 176400, 192000, 8000,  16000,
                                       22050, 24000, 32000,  44100,  48000, 96000,
                                       -8,    -16,   -16,    0};
  static const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

  BitReader br(file.data() + pos, file.size() - pos);
  std::vector<std::vector<int64_t>> chan_buf;

  // --- frames ---
  while (true) {
    br.align_to_byte();
    // find frame sync 0xFFF8/0xFFF9 (14-bit sync + mandatory-zero bit)
    uint32_t sync;
    if (!br.read_bits(14, &sync)) break;  // clean EOF
    if (sync != 0x3FFE) {
      // resync byte-by-byte
      continue;
    }
    uint32_t reserved, blocking;
    if (!br.read_bits(1, &reserved) || !br.read_bits(1, &blocking)) break;
    uint32_t bs_code, sr_code, chan_code, size_code, pad;
    if (!br.read_bits(4, &bs_code) || !br.read_bits(4, &sr_code) ||
        !br.read_bits(4, &chan_code) || !br.read_bits(3, &size_code) ||
        !br.read_bits(1, &pad)) {
      break;
    }
    uint64_t frame_index;
    if (!read_utf8_coded(&br, &frame_index)) {
      set_error("FLAC: bad frame number");
      return false;
    }

    int block_size;
    if (bs_code == 6) {
      uint32_t v;
      if (!br.read_bits(8, &v)) return false;
      block_size = (int)v + 1;
    } else if (bs_code == 7) {
      uint32_t v;
      if (!br.read_bits(16, &v)) return false;
      block_size = (int)v + 1;
    } else {
      block_size = kBlockSizes[bs_code];
      if (block_size <= 0) {
        set_error("FLAC: reserved block size");
        return false;
      }
    }

    if (sr_code == 12) {
      uint32_t v;
      if (!br.read_bits(8, &v)) return false;
    } else if (sr_code == 13 || sr_code == 14) {
      uint32_t v;
      if (!br.read_bits(16, &v)) return false;
    }
    (void)kSampleRates;

    int bps = size_code == 0 ? stream_bps : kSampleSizes[size_code];
    if (bps == 0) {
      set_error("FLAC: reserved sample size");
      return false;
    }

    uint32_t crc8;
    if (!br.read_bits(8, &crc8)) return false;

    int n_channels;
    enum { INDEP, LEFT_SIDE, RIGHT_SIDE, MID_SIDE } mode = INDEP;
    if (chan_code < 8) {
      n_channels = (int)chan_code + 1;
    } else if (chan_code == 8) {
      n_channels = 2;
      mode = LEFT_SIDE;
    } else if (chan_code == 9) {
      n_channels = 2;
      mode = RIGHT_SIDE;
    } else if (chan_code == 10) {
      n_channels = 2;
      mode = MID_SIDE;
    } else {
      set_error("FLAC: reserved channel assignment");
      return false;
    }

    chan_buf.resize(n_channels);
    for (int c = 0; c < n_channels; c++) {
      int sub_bps = bps;
      // the side channel carries one extra bit
      if ((mode == LEFT_SIDE && c == 1) || (mode == RIGHT_SIDE && c == 0) ||
          (mode == MID_SIDE && c == 1)) {
        sub_bps += 1;
      }
      if (!decode_subframe(&br, block_size, sub_bps, &chan_buf[c])) return false;
    }
    br.align_to_byte();
    uint32_t crc16;
    if (!br.read_bits(16, &crc16)) return false;

    // stereo decorrelation
    if (mode == LEFT_SIDE) {
      for (int i = 0; i < block_size; i++) {
        chan_buf[1][i] = chan_buf[0][i] - chan_buf[1][i];
      }
    } else if (mode == RIGHT_SIDE) {
      for (int i = 0; i < block_size; i++) {
        chan_buf[0][i] = chan_buf[0][i] + chan_buf[1][i];
      }
    } else if (mode == MID_SIDE) {
      for (int i = 0; i < block_size; i++) {
        int64_t side = chan_buf[1][i];
        int64_t mid = (chan_buf[0][i] << 1) | (side & 1);
        chan_buf[0][i] = (mid + side) >> 1;
        chan_buf[1][i] = (mid - side) >> 1;
      }
    }

    float scale = 1.0f / (float)(uint64_t(1) << (bps - 1));
    for (int i = 0; i < block_size; i++) {
      for (int c = 0; c < n_channels; c++) {
        out->samples.push_back((float)chan_buf[c][i] * scale);
        if (out->keep_raw) out->raw.push_back((int32_t)chan_buf[c][i]);
      }
    }
    out->bits_per_sample = bps;

    if (total_samples > 0 &&
        out->samples.size() >= (size_t)total_samples * stream_channels) {
      break;
    }
  }

  if (out->samples.empty()) {
    set_error("FLAC: no frames decoded");
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Downmix + resample
// ---------------------------------------------------------------------------

std::vector<float> downmix_mono(const DecodedAudio& in) {
  size_t frames = in.samples.size() / in.channels;
  std::vector<float> mono(frames);
  if (in.channels == 1) {
    memcpy(mono.data(), in.samples.data(), frames * sizeof(float));
    return mono;
  }
  float inv = 1.0f / in.channels;
  for (size_t i = 0; i < frames; i++) {
    float acc = 0.0f;
    for (int c = 0; c < in.channels; c++) acc += in.samples[i * in.channels + c];
    mono[i] = acc * inv;
  }
  return mono;
}

double bessel_i0(double x) {
  // series expansion; converges quickly for the beta values we use
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; k++) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

// Kaiser-windowed sinc resampler, direct evaluation with a precomputed
// filter table (oversampled impulse response + linear interpolation).
std::vector<float> resample(const std::vector<float>& in, int sr_in, int sr_out) {
  if (sr_in == sr_out || in.empty()) return in;

  const double ratio = (double)sr_out / sr_in;
  const double cutoff = 0.475 * std::min(1.0, ratio);  // cycles per input sample
  const int zeros = 16;                                 // sinc zero crossings
  const double half_width = zeros / (2.0 * cutoff);
  const int half_taps = (int)std::ceil(half_width);
  const double beta = 8.6;  // ~ -90 dB stopband
  const double i0_beta = bessel_i0(beta);

  // filter table: h(t) for t in [0, half_width], oversampled
  const int table_oversample = 64;
  const int table_size = half_taps * table_oversample + 2;
  std::vector<double> table(table_size);
  for (int i = 0; i < table_size; i++) {
    double t = (double)i / table_oversample;
    double x = 2.0 * cutoff * t;
    double sinc = (t == 0.0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
    double w = 0.0;
    double frac = t / half_width;
    if (frac <= 1.0) {
      w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - frac * frac))) / i0_beta;
    }
    table[i] = 2.0 * cutoff * sinc * w;
  }
  auto filt = [&](double t) -> double {
    double a = std::fabs(t) * table_oversample;
    int i = (int)a;
    if (i + 1 >= table_size) return 0.0;
    double f = a - i;
    return table[i] + f * (table[i + 1] - table[i]);
  };

  size_t n_out = (size_t)std::floor((double)in.size() * ratio);
  std::vector<float> out(n_out);
  for (size_t n = 0; n < n_out; n++) {
    double t_in = (double)n / ratio;
    int center = (int)std::floor(t_in);
    double acc = 0.0;
    int k0 = center - half_taps;
    int k1 = center + half_taps + 1;
    for (int k = k0; k <= k1; k++) {
      if (k < 0 || k >= (int)in.size()) continue;
      acc += in[k] * filt(t_in - k);
    }
    out[n] = (float)acc;
  }
  return out;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    set_error(std::string("cannot open file: ") + path);
    return false;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize((size_t)size);
  size_t got = fread(out->data(), 1, (size_t)size, f);
  fclose(f);
  if (got != (size_t)size) {
    set_error("short read");
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Decode `path` to mono float32 at `target_sr`. On success returns 0 and
// sets *out_samples (malloc'd, free with audioio_free) and *out_n.
int audioio_decode(const char* path, int target_sr, float** out_samples,
                   int64_t* out_n) {
  g_last_error.clear();
  std::vector<uint8_t> file;
  if (!read_file(path, &file)) return -1;

  DecodedAudio decoded;
  bool ok = false;
  if (file.size() >= 4 && memcmp(file.data(), "fLaC", 4) == 0) {
    ok = decode_flac(file, &decoded);
  } else if (file.size() >= 4 && memcmp(file.data(), "RIFF", 4) == 0) {
    ok = decode_wav(file, &decoded);
  } else {
    set_error("unrecognized container (supported: WAV, FLAC)");
  }
  if (!ok) return -1;

  std::vector<float> mono = downmix_mono(decoded);
  std::vector<float> resampled = resample(mono, decoded.sample_rate, target_sr);

  float* buf = (float*)malloc(resampled.size() * sizeof(float));
  if (!buf) {
    set_error("out of memory");
    return -1;
  }
  memcpy(buf, resampled.data(), resampled.size() * sizeof(float));
  *out_samples = buf;
  *out_n = (int64_t)resampled.size();
  return 0;
}

void audioio_free(float* p) { free(p); }

// Raw decode for verification: returns interleaved int32 samples at the
// original sample rate plus stream metadata, including the FLAC STREAMINFO
// MD5 so callers can checksum the decode end-to-end.
int audioio_decode_raw(const char* path, int32_t** out_samples, int64_t* out_n,
                       int* out_channels, int* out_rate, int* out_bps,
                       uint8_t* out_md5 /* 16 bytes */) {
  g_last_error.clear();
  std::vector<uint8_t> file;
  if (!read_file(path, &file)) return -1;

  DecodedAudio decoded;
  decoded.keep_raw = true;
  if (!(file.size() >= 4 && memcmp(file.data(), "fLaC", 4) == 0)) {
    set_error("raw decode only supported for FLAC");
    return -1;
  }
  if (!decode_flac(file, &decoded)) return -1;

  int32_t* buf = (int32_t*)malloc(decoded.raw.size() * sizeof(int32_t));
  if (!buf) {
    set_error("out of memory");
    return -1;
  }
  memcpy(buf, decoded.raw.data(), decoded.raw.size() * sizeof(int32_t));
  *out_samples = buf;
  *out_n = (int64_t)decoded.raw.size();
  *out_channels = decoded.channels;
  *out_rate = decoded.sample_rate;
  *out_bps = decoded.bits_per_sample;
  memcpy(out_md5, decoded.md5, 16);
  return 0;
}

void audioio_free_i32(int32_t* p) { free(p); }

const char* audioio_last_error() { return g_last_error.c_str(); }

// fp32 -> bf16 (round-to-nearest-even) and back; host-side analog of the
// reference's vImage fp16 conversion utilities
// (/root/reference/coreml/coremlUtility.mm:4-19).
// ---------------------------------------------------------------------------
// Native log-mel frontend: 400-point Hann STFT (hop 160, reflect padding,
// final frame dropped), Slaney mel projection, log10 + dynamic-range
// compression — the same contract as whisper_tpu/ops/stft.py. Useful for
// feeding features from a pure-native data loader.
// ---------------------------------------------------------------------------

namespace {

constexpr int kNFFT = 400;
constexpr int kHop = 160;
constexpr int kBins = kNFFT / 2 + 1;  // 201

double hz_to_mel(double f) {
  const double f_sp = 200.0 / 3.0;
  const double min_log_hz = 1000.0;
  const double min_log_mel = min_log_hz / f_sp;
  const double logstep = std::log(6.4) / 27.0;
  if (f >= min_log_hz) return min_log_mel + std::log(f / min_log_hz) / logstep;
  return f / f_sp;
}

double mel_to_hz(double m) {
  const double f_sp = 200.0 / 3.0;
  const double min_log_hz = 1000.0;
  const double min_log_mel = min_log_hz / f_sp;
  const double logstep = std::log(6.4) / 27.0;
  if (m >= min_log_mel) return min_log_hz * std::exp(logstep * (m - min_log_mel));
  return f_sp * m;
}

std::vector<double> mel_filterbank(int n_mels, int sr) {
  std::vector<double> fft_freqs(kBins);
  for (int i = 0; i < kBins; i++) fft_freqs[i] = (double)i * sr / kNFFT;

  std::vector<double> mel_edges(n_mels + 2);
  double lo = hz_to_mel(0.0), hi = hz_to_mel(sr / 2.0);
  for (int i = 0; i < n_mels + 2; i++) {
    mel_edges[i] = mel_to_hz(lo + (hi - lo) * i / (n_mels + 1));
  }

  std::vector<double> weights((size_t)n_mels * kBins, 0.0);
  for (int m = 0; m < n_mels; m++) {
    double f0 = mel_edges[m], f1 = mel_edges[m + 1], f2 = mel_edges[m + 2];
    double enorm = 2.0 / (f2 - f0);
    for (int k = 0; k < kBins; k++) {
      double lower = (fft_freqs[k] - f0) / (f1 - f0);
      double upper = (f2 - fft_freqs[k]) / (f2 - f1);
      double w = std::min(lower, upper);
      if (w > 0) weights[(size_t)m * kBins + k] = w * enorm;
    }
  }
  return weights;
}

}  // namespace

// Compute the (n_mels, n_frames) log-mel spectrogram of mono 16 kHz audio,
// optionally right-padded with `padding` zero samples. Caller frees *out
// with audioio_free. Returns 0 on success.
int audioio_log_mel(const float* audio, int64_t n_samples, int n_mels,
                    int64_t padding, float** out, int64_t* out_frames) {
  g_last_error.clear();
  if (n_mels != 80 && n_mels != 128) {
    set_error("n_mels must be 80 or 128");
    return -1;
  }
  const int64_t n = n_samples + padding;
  const int half = kNFFT / 2;
  if (n_samples < half + 1) {
    set_error("audio too short");
    return -1;
  }

  // reflect-padded sample accessor
  auto sample = [&](int64_t i) -> double {
    int64_t j = i - half;
    if (j < 0) j = -j;                     // left reflect
    if (j >= n) j = 2 * n - 2 - j;         // right reflect (within padded len)
    if (j >= n_samples) return 0.0;        // zero padding region
    return audio[j];
  };

  const int64_t n_frames_full = 1 + (n + 2LL * half - kNFFT) / kHop;
  const int64_t n_frames = n_frames_full - 1;  // final frame dropped

  // precompute window and DFT tables
  static thread_local std::vector<double> hann, cos_t, sin_t;
  if (hann.empty()) {
    hann.resize(kNFFT);
    for (int i = 0; i < kNFFT; i++) {
      hann[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / kNFFT);
    }
    cos_t.resize((size_t)kBins * kNFFT);
    sin_t.resize((size_t)kBins * kNFFT);
    for (int k = 0; k < kBins; k++) {
      for (int i = 0; i < kNFFT; i++) {
        double ang = 2.0 * M_PI * k * i / kNFFT;
        cos_t[(size_t)k * kNFFT + i] = std::cos(ang);
        sin_t[(size_t)k * kNFFT + i] = std::sin(ang);
      }
    }
  }

  std::vector<double> mel_w = mel_filterbank(n_mels, 16000);
  std::vector<double> power(kBins);
  std::vector<double> frame(kNFFT);
  std::vector<double> mel((size_t)n_mels * n_frames, 0.0);

  for (int64_t t = 0; t < n_frames; t++) {
    const int64_t base = t * kHop;
    for (int i = 0; i < kNFFT; i++) frame[i] = sample(base + i) * hann[i];
    for (int k = 0; k < kBins; k++) {
      const double* ct = &cos_t[(size_t)k * kNFFT];
      const double* st = &sin_t[(size_t)k * kNFFT];
      double re = 0.0, im = 0.0;
      for (int i = 0; i < kNFFT; i++) {
        re += frame[i] * ct[i];
        im -= frame[i] * st[i];
      }
      power[k] = re * re + im * im;
    }
    for (int m = 0; m < n_mels; m++) {
      const double* w = &mel_w[(size_t)m * kBins];
      double acc = 0.0;
      for (int k = 0; k < kBins; k++) acc += w[k] * power[k];
      mel[(size_t)m * n_frames + t] = acc;
    }
  }

  double global_max = -1e30;
  for (double& v : mel) {
    v = std::log10(std::max(v, 1e-10));
    global_max = std::max(global_max, v);
  }

  float* buf = (float*)malloc(mel.size() * sizeof(float));
  if (!buf) {
    set_error("out of memory");
    return -1;
  }
  for (size_t i = 0; i < mel.size(); i++) {
    double v = std::max(mel[i], global_max - 8.0);
    buf[i] = (float)((v + 4.0) / 4.0);
  }
  *out = buf;
  *out_frames = n_frames;
  return 0;
}

void audioio_f32_to_bf16(const float* src, uint16_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    uint32_t bits;
    memcpy(&bits, src + i, 4);
    uint32_t rounding = 0x7FFF + ((bits >> 16) & 1);
    dst[i] = (uint16_t)((bits + rounding) >> 16);
  }
}

void audioio_bf16_to_f32(const uint16_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    uint32_t bits = ((uint32_t)src[i]) << 16;
    memcpy(dst + i, &bits, 4);
  }
}

}  // extern "C"
