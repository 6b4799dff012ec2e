// pjrt_runner: native C++ host runtime on the PJRT C API.
//
// The reference's native layer (coreml/coreml.mm) owns compiled graphs and
// device buffers behind a C ABI, with Python only orchestrating. This is the
// TPU equivalent (SURVEY.md §2a item 1): dlopen a PJRT plugin (e.g. the TPU
// plugin), create a client, compile StableHLO programs produced by the
// offline exporter (whisper_tpu/export.py — the convert_*.py analog), own
// the resulting executables and device buffers, and execute synchronously.
//
// C ABI (ctypes bindings in whisper_tpu/runtime/pjrt.py):
//   wtpu_pjrt_load(plugin_path)                          -> api handle
//   wtpu_pjrt_client_create(api, keys, vals, types, n)   -> client handle
//   wtpu_pjrt_device_count / platform_name
//   wtpu_pjrt_compile(api, client, mlir, opts)           -> executable
//   wtpu_pjrt_execute(...)                               -> host outputs
//   wtpu_pjrt_*_destroy
//
// Buffers passed in stay device-resident for the duration of one execute;
// persistent cross-call device buffers (the arrayXa/arrayCK analog) are
// expressed in the graphs themselves (donated KV caches) rather than managed
// host-side.

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

thread_local std::string g_error;

void set_error(std::string msg) { g_error = std::move(msg); }

void debug_log(const char* msg) {
  if (getenv("WTPU_PJRT_DEBUG")) {
    fprintf(stderr, "[pjrt_runner] %s\n", msg);
    fflush(stderr);
  }
}

// Fetch + clear a PJRT_Error; returns true if there was an error.
bool consume_error(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err == nullptr) return false;
  PJRT_Error_Message_Args margs;
  memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  set_error(std::string(what) + ": " + std::string(margs.message, margs.message_size));
  PJRT_Error_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  return true;
}

bool await_event(const PJRT_Api* api, PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  PJRT_Error* err = api->PJRT_Event_Await(&args);
  PJRT_Event_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  api->PJRT_Event_Destroy(&dargs);
  return !consume_error(api, err, what);
}

struct Client {
  const PJRT_Api* api;
  PJRT_Client* client;
  std::vector<PJRT_Device*> devices;
};

}  // namespace

extern "C" {

const char* wtpu_pjrt_last_error() { return g_error.c_str(); }

// dlopen the plugin, resolve GetPjrtApi, run PJRT_Plugin_Initialize.
const void* wtpu_pjrt_load(const char* plugin_path) {
  g_error.clear();
  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    set_error(std::string("dlopen failed: ") + dlerror());
    return nullptr;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = (GetPjrtApiFn)dlsym(handle, "GetPjrtApi");
  if (!get_api) {
    set_error("plugin has no GetPjrtApi symbol");
    return nullptr;
  }
  const PJRT_Api* api = get_api();
  if (!api) {
    set_error("GetPjrtApi returned null");
    return nullptr;
  }

  PJRT_Plugin_Initialize_Args init;
  memset(&init, 0, sizeof(init));
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  if (consume_error(api, api->PJRT_Plugin_Initialize(&init), "PJRT_Plugin_Initialize")) {
    return nullptr;
  }
  return api;
}

// Create a client. Options are (name, type, value) triples:
//   type 0: string (value = svals[i])
//   type 1: int64  (value = ivals[i])
//   type 2: bool   (value = ivals[i] != 0)
void* wtpu_pjrt_client_create(const void* api_ptr, const char** names,
                              const char** svals, const int64_t* ivals,
                              const int32_t* types, int32_t n_options) {
  g_error.clear();
  const PJRT_Api* api = (const PJRT_Api*)api_ptr;

  std::vector<PJRT_NamedValue> options((size_t)n_options);
  for (int i = 0; i < n_options; i++) {
    PJRT_NamedValue& nv = options[i];
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = names[i];
    nv.name_size = strlen(names[i]);
    if (types[i] == 0) {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = svals[i];
      nv.value_size = strlen(svals[i]);
    } else if (types[i] == 1) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = ivals[i];
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kBool;
      nv.bool_value = ivals[i] != 0;
      nv.value_size = 1;
    }
  }

  PJRT_Client_Create_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  args.create_options = options.data();
  args.num_options = options.size();
  if (consume_error(api, api->PJRT_Client_Create(&args), "PJRT_Client_Create")) {
    return nullptr;
  }

  auto* c = new Client;
  c->api = api;
  c->client = args.client;

  PJRT_Client_AddressableDevices_Args dev_args;
  memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = c->client;
  if (consume_error(api, api->PJRT_Client_AddressableDevices(&dev_args),
                    "PJRT_Client_AddressableDevices")) {
    delete c;
    return nullptr;
  }
  c->devices.assign(dev_args.addressable_devices,
                    dev_args.addressable_devices + dev_args.num_addressable_devices);
  return c;
}

int wtpu_pjrt_device_count(void* client_ptr) {
  auto* c = (Client*)client_ptr;
  return (int)c->devices.size();
}

int wtpu_pjrt_platform_name(void* client_ptr, char* buf, int buf_len) {
  auto* c = (Client*)client_ptr;
  PJRT_Client_PlatformName_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  args.client = c->client;
  if (consume_error(c->api, c->api->PJRT_Client_PlatformName(&args),
                    "PJRT_Client_PlatformName")) {
    return -1;
  }
  int n = (int)args.platform_name_size < buf_len - 1 ? (int)args.platform_name_size
                                                     : buf_len - 1;
  memcpy(buf, args.platform_name, n);
  buf[n] = 0;
  return n;
}

// Compile a StableHLO module (text or bytecode) with serialized
// xla.CompileOptionsProto bytes (produced by whisper_tpu/export.py).
void* wtpu_pjrt_compile(void* client_ptr, const char* mlir, int64_t mlir_size,
                        const char* compile_options, int64_t options_size) {
  g_error.clear();
  auto* c = (Client*)client_ptr;

  PJRT_Program program;
  memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir);
  program.code_size = (size_t)mlir_size;
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.client = c->client;
  args.program = &program;
  args.compile_options = compile_options;
  args.compile_options_size = (size_t)options_size;
  if (consume_error(c->api, c->api->PJRT_Client_Compile(&args), "PJRT_Client_Compile")) {
    return nullptr;
  }
  return args.executable;
}

// Synchronous execute on device 0.
//   arg i: data=arg_data[i], dims=arg_dims + offsets by arg_ndims, dtype code
//   dtype codes mirror PJRT_Buffer_Type (passed from python):
//     11=F32 (PJRT_Buffer_Type_F32), etc. — python passes the enum value.
// Outputs are copied to caller-allocated out_data[i] of capacity
// out_capacity[i] bytes; out_sizes[i] receives the actual byte size.
int wtpu_pjrt_execute(void* client_ptr, void* exec_ptr, int32_t num_args,
                      const void** arg_data, const int64_t* arg_dims_flat,
                      const int32_t* arg_ndims, const int32_t* arg_types,
                      int32_t num_outputs, void** out_data,
                      const int64_t* out_capacity, int64_t* out_sizes,
                      const int64_t* out_dims_flat, const int32_t* out_ndims,
                      const int32_t* out_elem_size) {
  g_error.clear();
  auto* c = (Client*)client_ptr;
  const PJRT_Api* api = c->api;
  auto* exec = (PJRT_LoadedExecutable*)exec_ptr;

  std::vector<PJRT_Buffer*> arg_buffers((size_t)num_args, nullptr);
  int dims_offset = 0;

  for (int i = 0; i < num_args; i++) {
    PJRT_Client_BufferFromHostBuffer_Args bargs;
    memset(&bargs, 0, sizeof(bargs));
    bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bargs.client = c->client;
    bargs.data = arg_data[i];
    bargs.type = (PJRT_Buffer_Type)arg_types[i];
    bargs.dims = arg_dims_flat + dims_offset;
    bargs.num_dims = (size_t)arg_ndims[i];
    dims_offset += arg_ndims[i];
    bargs.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bargs.device = c->devices[0];
    if (consume_error(api, api->PJRT_Client_BufferFromHostBuffer(&bargs),
                      "BufferFromHostBuffer")) {
      return -1;
    }
    arg_buffers[i] = bargs.buffer;
    debug_log("arg staged; awaiting host-buffer event");
    if (!await_event(api, bargs.done_with_host_buffer, "host buffer transfer")) {
      return -1;
    }
    debug_log("host-buffer event done");
  }

  PJRT_ExecuteOptions options;
  memset(&options, 0, sizeof(options));
  options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  std::vector<PJRT_Buffer*> outputs((size_t)num_outputs, nullptr);
  PJRT_Buffer* const* arg_list = arg_buffers.data();
  PJRT_Buffer** out_list = outputs.data();
  PJRT_Event* done_event = nullptr;

  PJRT_LoadedExecutable_Execute_Args eargs;
  memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  eargs.executable = exec;
  eargs.options = &options;
  eargs.argument_lists = &arg_list;
  eargs.num_devices = 1;
  eargs.num_args = (size_t)num_args;
  eargs.output_lists = &out_list;
  eargs.device_complete_events = &done_event;
  debug_log("calling Execute");
  if (consume_error(api, api->PJRT_LoadedExecutable_Execute(&eargs), "Execute")) {
    return -1;
  }
  debug_log("Execute returned; awaiting completion event");
  if (!await_event(api, done_event, "execution")) return -1;
  debug_log("execution complete");

  // copy outputs back; the caller supplies exact capacities from the export
  // spec (the size-query form of ToHostBuffer stalls on some plugins)
  for (int i = 0; i < num_outputs; i++) {
    // wait until the output buffer itself is ready before copying
    PJRT_Buffer_ReadyEvent_Args rargs;
    memset(&rargs, 0, sizeof(rargs));
    rargs.struct_size = PJRT_Buffer_ReadyEvent_Args_STRUCT_SIZE;
    rargs.buffer = outputs[i];
    debug_log("getting output ready event");
    if (consume_error(api, api->PJRT_Buffer_ReadyEvent(&rargs), "ReadyEvent")) {
      return -1;
    }
    if (!await_event(api, rargs.event, "output readiness")) return -1;
    debug_log("output ready");

    // dense row-major host byte strides for this output (a tiled device
    // layout with a null host_layout stalls the copy on some plugins)
    int out_dims_offset = 0;
    for (int k = 0; k < i; k++) out_dims_offset += out_ndims[k];
    // row-major dense: minor_to_major = [ndims-1, ..., 0], no tiles
    // (the plugin, like jaxlib's ToLiteral path, accepts only Tiled layouts)
    std::vector<int64_t> minor_to_major((size_t)out_ndims[i]);
    for (int d = 0; d < out_ndims[i]; d++) {
      minor_to_major[d] = out_ndims[i] - 1 - d;
    }
    (void)out_dims_offset;
    (void)out_elem_size;
    PJRT_Buffer_MemoryLayout host_layout;
    memset(&host_layout, 0, sizeof(host_layout));
    host_layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    host_layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    host_layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    host_layout.tiled.minor_to_major = minor_to_major.data();
    host_layout.tiled.minor_to_major_size = minor_to_major.size();
    host_layout.tiled.tile_dims = nullptr;
    host_layout.tiled.tile_dim_sizes = nullptr;
    host_layout.tiled.num_tiles = 0;

    if (getenv("WTPU_PJRT_RAW_COPY")) {
      PJRT_Buffer_CopyRawToHost_Args cargs;
      memset(&cargs, 0, sizeof(cargs));
      cargs.struct_size = PJRT_Buffer_CopyRawToHost_Args_STRUCT_SIZE;
      cargs.buffer = outputs[i];
      cargs.dst = out_data[i];
      cargs.offset = 0;
      cargs.transfer_size = out_capacity[i];
      debug_log("raw-copying output to host");
      if (consume_error(api, api->PJRT_Buffer_CopyRawToHost(&cargs), "CopyRawToHost")) {
        return -1;
      }
      if (!await_event(api, cargs.event, "raw device->host copy")) return -1;
      out_sizes[i] = out_capacity[i];
    } else {
      PJRT_Buffer_ToHostBuffer_Args targs;
      memset(&targs, 0, sizeof(targs));
      targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      targs.src = outputs[i];
      targs.host_layout = &host_layout;
      targs.dst = out_data[i];
      targs.dst_size = (size_t)out_capacity[i];
      debug_log("copying output to host");
      if (consume_error(api, api->PJRT_Buffer_ToHostBuffer(&targs), "ToHostBuffer")) {
        return -1;
      }
      if (!await_event(api, targs.event, "device->host copy")) return -1;
      out_sizes[i] = (int64_t)targs.dst_size;
    }
    debug_log("output copied");
  }

  for (PJRT_Buffer* b : arg_buffers) {
    PJRT_Buffer_Destroy_Args dargs;
    memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    dargs.buffer = b;
    consume_error(api, api->PJRT_Buffer_Destroy(&dargs), "Buffer_Destroy");
  }
  for (PJRT_Buffer* b : outputs) {
    PJRT_Buffer_Destroy_Args dargs;
    memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    dargs.buffer = b;
    consume_error(api, api->PJRT_Buffer_Destroy(&dargs), "Buffer_Destroy");
  }
  g_error.clear();
  return 0;
}


// ---------------------------------------------------------------------------
// Persistent device buffers + handle-based execution: the analog of the
// reference's device-resident arrayXa / arrayCK / arrayMKV448 buffers shared
// between graphs via output backings (coreml.mm:19-23,231-233). Buffers stay
// on device across calls; executables compiled from donated-argument exports
// alias their cache input to the corresponding output, so the KV cache never
// leaves HBM.
// ---------------------------------------------------------------------------

// Upload host data to a device buffer; returns a PJRT_Buffer* handle.
void* wtpu_pjrt_buffer_from_host(void* client_ptr, const void* data,
                                 const int64_t* dims, int32_t ndims,
                                 int32_t type) {
  g_error.clear();
  auto* c = (Client*)client_ptr;
  PJRT_Client_BufferFromHostBuffer_Args bargs;
  memset(&bargs, 0, sizeof(bargs));
  bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  bargs.client = c->client;
  bargs.data = data;
  bargs.type = (PJRT_Buffer_Type)type;
  bargs.dims = dims;
  bargs.num_dims = (size_t)ndims;
  bargs.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  bargs.device = c->devices[0];
  if (consume_error(c->api, c->api->PJRT_Client_BufferFromHostBuffer(&bargs),
                    "BufferFromHostBuffer")) {
    return nullptr;
  }
  if (!await_event(c->api, bargs.done_with_host_buffer, "host buffer transfer")) {
    return nullptr;
  }
  return bargs.buffer;
}

// Execute with device-resident buffer handles. Outputs are returned as NEW
// device handles in out_handles (caller owns; destroy or reuse). Donated
// inputs are consumed: their handles must not be used again.
int wtpu_pjrt_execute_handles(void* client_ptr, void* exec_ptr, int32_t num_args,
                              void** arg_handles, int32_t num_outputs,
                              void** out_handles) {
  g_error.clear();
  auto* c = (Client*)client_ptr;
  const PJRT_Api* api = c->api;

  std::vector<PJRT_Buffer*> args_vec((size_t)num_args);
  for (int i = 0; i < num_args; i++) args_vec[i] = (PJRT_Buffer*)arg_handles[i];
  std::vector<PJRT_Buffer*> outputs((size_t)num_outputs, nullptr);

  PJRT_ExecuteOptions options;
  memset(&options, 0, sizeof(options));
  options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* const* arg_list = args_vec.data();
  PJRT_Buffer** out_list = outputs.data();
  PJRT_Event* done_event = nullptr;

  PJRT_LoadedExecutable_Execute_Args eargs;
  memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  eargs.executable = (PJRT_LoadedExecutable*)exec_ptr;
  eargs.options = &options;
  eargs.argument_lists = &arg_list;
  eargs.num_devices = 1;
  eargs.num_args = (size_t)num_args;
  eargs.output_lists = &out_list;
  eargs.device_complete_events = &done_event;
  if (consume_error(api, api->PJRT_LoadedExecutable_Execute(&eargs), "Execute")) {
    return -1;
  }
  if (!await_event(api, done_event, "execution")) return -1;
  for (int i = 0; i < num_outputs; i++) out_handles[i] = outputs[i];
  return 0;
}

// Copy a device buffer to host (dense row-major).
int wtpu_pjrt_buffer_to_host(void* client_ptr, void* buffer, void* dst,
                             int64_t capacity, const int64_t* dims,
                             int32_t ndims) {
  g_error.clear();
  auto* c = (Client*)client_ptr;
  const PJRT_Api* api = c->api;
  (void)dims;

  std::vector<int64_t> minor_to_major((size_t)ndims);
  for (int d = 0; d < ndims; d++) minor_to_major[d] = ndims - 1 - d;
  PJRT_Buffer_MemoryLayout host_layout;
  memset(&host_layout, 0, sizeof(host_layout));
  host_layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
  host_layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
  host_layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
  host_layout.tiled.minor_to_major = minor_to_major.data();
  host_layout.tiled.minor_to_major_size = minor_to_major.size();

  PJRT_Buffer_ToHostBuffer_Args targs;
  memset(&targs, 0, sizeof(targs));
  targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  targs.src = (PJRT_Buffer*)buffer;
  targs.host_layout = &host_layout;
  targs.dst = dst;
  targs.dst_size = (size_t)capacity;
  if (consume_error(api, api->PJRT_Buffer_ToHostBuffer(&targs), "ToHostBuffer")) {
    return -1;
  }
  if (!await_event(api, targs.event, "device->host copy")) return -1;
  return 0;
}

void wtpu_pjrt_buffer_destroy(void* client_ptr, void* buffer) {
  auto* c = (Client*)client_ptr;
  PJRT_Buffer_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  dargs.buffer = (PJRT_Buffer*)buffer;
  consume_error(c->api, c->api->PJRT_Buffer_Destroy(&dargs), "Buffer_Destroy");
}

int wtpu_pjrt_executable_num_outputs(void* client_ptr, void* exec_ptr) {
  auto* c = (Client*)client_ptr;
  PJRT_LoadedExecutable_GetExecutable_Args gargs;
  memset(&gargs, 0, sizeof(gargs));
  gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  gargs.loaded_executable = (PJRT_LoadedExecutable*)exec_ptr;
  if (consume_error(c->api, c->api->PJRT_LoadedExecutable_GetExecutable(&gargs),
                    "GetExecutable")) {
    return -1;
  }
  PJRT_Executable_NumOutputs_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  args.executable = gargs.executable;
  if (consume_error(c->api, c->api->PJRT_Executable_NumOutputs(&args), "NumOutputs")) {
    return -1;
  }
  return (int)args.num_outputs;
}

// Serialize a loaded executable to caller buffer (query size with dst=null).
// The serialized form skips recompilation on later runs
// (PJRT_Executable_DeserializeAndLoad) — the native analog of the XLA
// persistent compilation cache / the reference's cached 1.5 s CoreML load.
int64_t wtpu_pjrt_executable_serialize(void* client_ptr, void* exec_ptr,
                                       void* dst, int64_t dst_capacity) {
  g_error.clear();
  auto* c = (Client*)client_ptr;
  PJRT_LoadedExecutable_GetExecutable_Args gargs;
  memset(&gargs, 0, sizeof(gargs));
  gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  gargs.loaded_executable = (PJRT_LoadedExecutable*)exec_ptr;
  if (consume_error(c->api, c->api->PJRT_LoadedExecutable_GetExecutable(&gargs),
                    "GetExecutable")) {
    return -1;
  }
  PJRT_Executable_Serialize_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Executable_Serialize_Args_STRUCT_SIZE;
  args.executable = gargs.executable;
  if (consume_error(c->api, c->api->PJRT_Executable_Serialize(&args),
                    "Executable_Serialize")) {
    return -1;
  }
  int64_t n = (int64_t)args.serialized_bytes_size;
  if (dst != nullptr) {
    if (dst_capacity < n) {
      set_error("serialize: destination too small");
      n = -1;
    } else {
      memcpy(dst, args.serialized_bytes, (size_t)n);
    }
  }
  if (args.serialized_executable_deleter) {
    args.serialized_executable_deleter(args.serialized_executable);
  }
  return n;
}

// Load an executable serialized by wtpu_pjrt_executable_serialize (same
// platform + plugin version required).
void* wtpu_pjrt_executable_deserialize(void* client_ptr, const void* data,
                                       int64_t size) {
  g_error.clear();
  auto* c = (Client*)client_ptr;
  PJRT_Executable_DeserializeAndLoad_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
  args.client = c->client;
  args.serialized_executable = (const char*)data;
  args.serialized_executable_size = (size_t)size;
  if (consume_error(c->api, c->api->PJRT_Executable_DeserializeAndLoad(&args),
                    "DeserializeAndLoad")) {
    return nullptr;
  }
  return args.loaded_executable;
}

void wtpu_pjrt_executable_destroy(void* client_ptr, void* exec_ptr) {
  auto* c = (Client*)client_ptr;
  PJRT_LoadedExecutable_Destroy_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  args.executable = (PJRT_LoadedExecutable*)exec_ptr;
  consume_error(c->api, c->api->PJRT_LoadedExecutable_Destroy(&args), "Exec_Destroy");
}

void wtpu_pjrt_client_destroy(void* client_ptr) {
  auto* c = (Client*)client_ptr;
  PJRT_Client_Destroy_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  args.client = c->client;
  consume_error(c->api, c->api->PJRT_Client_Destroy(&args), "Client_Destroy");
  delete c;
}

}  // extern "C"
