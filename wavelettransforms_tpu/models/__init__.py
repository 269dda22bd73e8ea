from .hf_io import (
    conv_weight_names,
    create_random_checkpoint,
    flax_to_torch_state,
    hf_config_dict,
    load_config,
    load_torch_state,
    save_torch_state,
    torch_layer_name,
    torch_state_to_flax,
)
from .resnet import ResNetConfig, ResNetForImageClassification, create_model

__all__ = [
    "ResNetConfig", "ResNetForImageClassification", "create_model",
    "conv_weight_names", "create_random_checkpoint", "flax_to_torch_state",
    "hf_config_dict", "load_config", "load_torch_state", "save_torch_state",
    "torch_layer_name", "torch_state_to_flax",
]
