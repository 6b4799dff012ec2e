from .dims import MODEL_DIMS, ModelDimensions
from .params import (
    init_random_params,
    load_params_npz,
    params_from_torch_state_dict,
    save_params_npz,
)
from .whisper import Whisper

__all__ = [
    "MODEL_DIMS",
    "ModelDimensions",
    "Whisper",
    "init_random_params",
    "load_params_npz",
    "params_from_torch_state_dict",
    "save_params_npz",
]
