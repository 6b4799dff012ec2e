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

    def load_graph(self, export_dir: str, name: str):
        """Compile an exported graph directory entry."""
        with open(os.path.join(export_dir, f"{name}.mlir"), "rb") as f:
            mlir = f.read()
        with open(os.path.join(export_dir, f"{name}.compile_options.pb"), "rb") as f:
            copts = f.read()
        with open(os.path.join(export_dir, f"{name}.spec.json")) as f:
            spec = json.load(f)
        exe = self.lib.wtpu_pjrt_compile(
            self.client, mlir, len(mlir), copts, len(copts)
        )
        if not exe:
            raise RuntimeError(self._err(f"compile of {name!r} failed"))
        self._executables[name] = (exe, spec)
        return spec

    def execute(self, name: str, inputs: Sequence[np.ndarray]) -> List[np.ndarray]:
        exe, spec = self._executables[name]
        inputs = [np.ascontiguousarray(a) for a in inputs]
        assert len(inputs) == len(spec["inputs"]), "input arity mismatch"

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

    def close(self):
        for exe, _ in self._executables.values():
            self.lib.wtpu_pjrt_executable_destroy(self.client, exe)
        self._executables.clear()
        if self.client:
            self.lib.wtpu_pjrt_client_destroy(self.client)
            self.client = None
