"""ctypes bindings for the native PJRT runtime (runtime/pjrt_runner.cpp).

PjrtRunner loads a PJRT plugin (TPU, or any GetPjrtApi-exporting .so),
compiles StableHLO graphs exported by whisper_tpu/export.py, and executes
them with numpy inputs — the C ABI mirror of the reference's
Coreml bridge class (/root/reference/whisper/coreml.py:19-244), with
compiled-graph loading, persistent client state, and synchronous predicts.
"""

import ctypes
import json
import os
import uuid
from typing import Dict, List, Optional, Sequence

import numpy as np

_LIB_NAME = "pjrt_runner.so"


def _load_lib() -> ctypes.CDLL:
    path = os.path.join(os.path.dirname(__file__), _LIB_NAME)
    if not os.path.isfile(path):
        raise RuntimeError(
            "pjrt_runner.so not built (make -C runtime; requires the "
            "tensorflow package for pjrt_c_api.h)"
        )
    lib = ctypes.CDLL(path)
    lib.wtpu_pjrt_last_error.restype = ctypes.c_char_p
    lib.wtpu_pjrt_load.restype = ctypes.c_void_p
    lib.wtpu_pjrt_load.argtypes = [ctypes.c_char_p]
    lib.wtpu_pjrt_client_create.restype = ctypes.c_void_p
    lib.wtpu_pjrt_client_create.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.wtpu_pjrt_device_count.argtypes = [ctypes.c_void_p]
    lib.wtpu_pjrt_platform_name.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.wtpu_pjrt_compile.restype = ctypes.c_void_p
    lib.wtpu_pjrt_compile.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    lib.wtpu_pjrt_executable_num_outputs.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.wtpu_pjrt_execute.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wtpu_pjrt_executable_destroy.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.wtpu_pjrt_client_destroy.argtypes = [ctypes.c_void_p]
    lib.wtpu_pjrt_buffer_from_host.restype = ctypes.c_void_p
    lib.wtpu_pjrt_buffer_from_host.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.wtpu_pjrt_execute_handles.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.wtpu_pjrt_buffer_to_host.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.wtpu_pjrt_buffer_destroy.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.wtpu_pjrt_executable_serialize.restype = ctypes.c_int64
    lib.wtpu_pjrt_executable_serialize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.wtpu_pjrt_executable_deserialize.restype = ctypes.c_void_p
    lib.wtpu_pjrt_executable_deserialize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    return lib


def default_axon_options() -> Dict:
    """Client options matching this environment's axon plugin registration
    (topology + fresh session id + remote compile)."""
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return {
        "topology": f"{gen}:1x1x1",
        "session_id": str(uuid.uuid4()),
        "remote_compile": os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
    }


class PjrtRunner:
    def __init__(self, plugin_path: str, options: Optional[Dict] = None):
        self.lib = _load_lib()
        self.api = self.lib.wtpu_pjrt_load(plugin_path.encode())
        if not self.api:
            raise RuntimeError(self._err("plugin load failed"))

        options = options or {}
        names, svals, ivals, types = [], [], [], []
        for k, v in options.items():
            names.append(k.encode())
            if isinstance(v, bool):
                svals.append(b"")
                ivals.append(int(v))
                types.append(2)
            elif isinstance(v, int):
                svals.append(b"")
                ivals.append(v)
                types.append(1)
            else:
                svals.append(str(v).encode())
                ivals.append(0)
                types.append(0)
        n = len(names)
        self.client = self.lib.wtpu_pjrt_client_create(
            self.api,
            (ctypes.c_char_p * n)(*names),
            (ctypes.c_char_p * n)(*svals),
            (ctypes.c_int64 * n)(*ivals),
            (ctypes.c_int32 * n)(*types),
            n,
        )
        if not self.client:
            raise RuntimeError(self._err("client create failed"))
        self._executables: Dict[str, tuple] = {}

    def _err(self, prefix: str) -> str:
        msg = self.lib.wtpu_pjrt_last_error().decode("utf-8", errors="replace")
        return f"{prefix}: {msg}"

    @property
    def device_count(self) -> int:
        return self.lib.wtpu_pjrt_device_count(self.client)

    @property
    def platform(self) -> str:
        buf = ctypes.create_string_buffer(128)
        n = self.lib.wtpu_pjrt_platform_name(self.client, buf, 128)
        if n < 0:
            raise RuntimeError(self._err("platform name failed"))
        return buf.value.decode()

    def load_graph(self, export_dir: str, name: str, cache_dir: Optional[str] = None):
        """Compile an exported graph directory entry. With `cache_dir`, a
        platform-serialized executable (PJRT_Executable_Serialize) is reused
        across processes — the native analog of the reference's cached 1.5 s
        CoreML load vs its 4 m 14 s first compile."""
        with open(os.path.join(export_dir, f"{name}.spec.json")) as f:
            spec = json.load(f)
        cache_path = None
        if cache_dir:
            import hashlib

            os.makedirs(cache_dir, exist_ok=True)
            with open(os.path.join(export_dir, f"{name}.mlir"), "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            # program hash in the key: a stale executable with mismatched
            # arity crashes the device rather than erroring
            cache_path = os.path.join(cache_dir, f"{name}.{digest}.pjrt_exe")
            if os.path.exists(cache_path):
                with open(cache_path, "rb") as f:
                    blob = f.read()
                exe = self.lib.wtpu_pjrt_executable_deserialize(
                    self.client, blob, len(blob)
                )
                if exe:
                    self._executables[name] = (exe, spec)
                    return spec
                # stale/incompatible cache entry: fall through to compile

        with open(os.path.join(export_dir, f"{name}.mlir"), "rb") as f:
            mlir = f.read()
        with open(os.path.join(export_dir, f"{name}.compile_options.pb"), "rb") as f:
            copts = f.read()
        exe = self.lib.wtpu_pjrt_compile(
            self.client, mlir, len(mlir), copts, len(copts)
        )
        if not exe:
            raise RuntimeError(self._err(f"compile of {name!r} failed"))
        self._executables[name] = (exe, spec)
        if cache_path:
            n = self.lib.wtpu_pjrt_executable_serialize(self.client, exe, None, 0)
            if n > 0:
                buf = ctypes.create_string_buffer(n)
                if self.lib.wtpu_pjrt_executable_serialize(self.client, exe, buf, n) == n:
                    tmp = cache_path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(buf.raw)
                    os.replace(tmp, cache_path)
        return spec

    def execute(self, name: str, inputs: Sequence[np.ndarray]) -> List[np.ndarray]:
        exe, spec = self._executables[name]
        assert len(inputs) == len(spec["inputs"]), "input arity mismatch"
        # np.ascontiguousarray promotes 0-d arrays (and numpy scalars) to
        # 1-d; scalar graph inputs must keep their declared [] shape
        inputs = [
            np.ascontiguousarray(a).reshape(ispec["shape"])
            for a, ispec in zip(inputs, spec["inputs"])
        ]

        dims_flat: List[int] = []
        ndims, types, data_ptrs = [], [], []
        for a, ispec in zip(inputs, spec["inputs"]):
            assert list(a.shape) == ispec["shape"], (a.shape, ispec["shape"])
            dims_flat.extend(a.shape)
            ndims.append(a.ndim)
            types.append(ispec["pjrt_type"])
            data_ptrs.append(a.ctypes.data_as(ctypes.c_void_p))

        n_out = len(spec["outputs"])
        out_bufs = [
            ctypes.create_string_buffer(ospec["nbytes"]) for ospec in spec["outputs"]
        ]
        out_ptrs = (ctypes.c_void_p * n_out)(
            *[ctypes.cast(b, ctypes.c_void_p) for b in out_bufs]
        )
        out_cap = (ctypes.c_int64 * n_out)(*[o["nbytes"] for o in spec["outputs"]])
        out_sizes = (ctypes.c_int64 * n_out)()
        out_dims_flat: List[int] = []
        out_ndims, out_elem = [], []
        for ospec in spec["outputs"]:
            out_dims_flat.extend(ospec["shape"])
            out_ndims.append(len(ospec["shape"]))
            n_elems = int(np.prod(ospec["shape"])) or 1
            out_elem.append(ospec["nbytes"] // n_elems)

        rc = self.lib.wtpu_pjrt_execute(
            self.client,
            exe,
            len(inputs),
            (ctypes.c_void_p * len(inputs))(*data_ptrs),
            (ctypes.c_int64 * len(dims_flat))(*dims_flat),
            (ctypes.c_int32 * len(ndims))(*ndims),
            (ctypes.c_int32 * len(types))(*types),
            n_out,
            out_ptrs,
            out_cap,
            out_sizes,
            (ctypes.c_int64 * len(out_dims_flat))(*out_dims_flat),
            (ctypes.c_int32 * n_out)(*out_ndims),
            (ctypes.c_int32 * n_out)(*out_elem),
        )
        if rc != 0:
            raise RuntimeError(self._err(f"execute of {name!r} failed"))

        results = []
        for buf, ospec in zip(out_bufs, spec["outputs"]):
            raw = np.frombuffer(buf, dtype=np.uint8, count=ospec["nbytes"])
            if ospec["dtype"] == "bfloat16":
                from .native import bf16_to_f32

                arr = bf16_to_f32(raw.view(np.uint16)).reshape(ospec["shape"])
            else:
                arr = raw.view(np.dtype(ospec["dtype"])).reshape(ospec["shape"]).copy()
            results.append(arr)
        return results

    # ---- persistent device buffers (the arrayMKV448 analog) ---------------

    def buffer_from_host(self, arr: np.ndarray, pjrt_type: Optional[int] = None) -> "DeviceBuffer":
        """Upload a host array; the buffer stays device-resident until
        destroyed or consumed by a donated executable input."""
        arr = np.ascontiguousarray(arr)
        if pjrt_type is None:
            pjrt_type = {
                "float32": 11,
                "int32": 4,
                "uint16": 7,  # bf16 bit pattern uploads use the bf16 code explicitly
            }[str(arr.dtype)]
        dims = (ctypes.c_int64 * arr.ndim)(*arr.shape)
        h = self.lib.wtpu_pjrt_buffer_from_host(
            self.client, arr.ctypes.data_as(ctypes.c_void_p), dims, arr.ndim, pjrt_type
        )
        if not h:
            raise RuntimeError(self._err("buffer upload failed"))
        return DeviceBuffer(h, tuple(arr.shape), str(arr.dtype))

    def execute_handles(self, name: str, buffers: Sequence["DeviceBuffer"]) -> List["DeviceBuffer"]:
        """Execute with device-resident inputs; outputs stay on device.
        Donated inputs (per the exported graph) are consumed — their handles
        must not be reused."""
        exe, spec = self._executables[name]
        n_out = len(spec["outputs"])
        arg_handles = (ctypes.c_void_p * len(buffers))(*[b.handle for b in buffers])
        out_handles = (ctypes.c_void_p * n_out)()
        rc = self.lib.wtpu_pjrt_execute_handles(
            self.client, exe, len(buffers), arg_handles, n_out, out_handles
        )
        if rc != 0:
            raise RuntimeError(self._err(f"execute_handles of {name!r} failed"))
        return [
            DeviceBuffer(out_handles[i], tuple(o["shape"]), o["dtype"])
            for i, o in enumerate(spec["outputs"])
        ]

    def to_host(self, buf: "DeviceBuffer") -> np.ndarray:
        itemsize = 2 if buf.dtype == "bfloat16" else np.dtype(buf.dtype).itemsize
        nbytes = int(np.prod(buf.shape, dtype=np.int64)) * itemsize if buf.shape else itemsize
        raw = ctypes.create_string_buffer(nbytes)
        dims = (ctypes.c_int64 * len(buf.shape))(*buf.shape)
        rc = self.lib.wtpu_pjrt_buffer_to_host(
            self.client, buf.handle, ctypes.cast(raw, ctypes.c_void_p), nbytes, dims, len(buf.shape)
        )
        if rc != 0:
            raise RuntimeError(self._err("buffer download failed"))
        data = np.frombuffer(raw, dtype=np.uint8, count=nbytes)
        if buf.dtype == "bfloat16":
            from .native import bf16_to_f32

            return bf16_to_f32(data.view(np.uint16)).reshape(buf.shape)
        return data.view(np.dtype(buf.dtype)).reshape(buf.shape).copy()

    def destroy_buffer(self, buf: "DeviceBuffer"):
        self.lib.wtpu_pjrt_buffer_destroy(self.client, buf.handle)
        buf.handle = None

    def close(self):
        for exe, _ in self._executables.values():
            self.lib.wtpu_pjrt_executable_destroy(self.client, exe)
        self._executables.clear()
        if self.client:
            self.lib.wtpu_pjrt_client_destroy(self.client)
            self.client = None


class DeviceBuffer:
    """Handle to a device-resident PJRT buffer."""

    def __init__(self, handle, shape, dtype):
        self.handle = handle
        self.shape = shape
        self.dtype = dtype

    def __repr__(self):
        return f"DeviceBuffer(shape={self.shape}, dtype={self.dtype})"
