"""JAX-native model zoo.

The reference ships model *export scripts* that freeze torchvision/HF
models to TorchScript (reference: models/import_resnet.py — 9 ResNet
family variants; models/import_vit.py — ViT-B/16, ViT-L/16;
models/import_bert-base-uncased.py — BertModel returning
last_hidden_state). Here the same families are defined natively as pure
JAX functions over explicit param pytrees, so they can be jitted,
quantized (ops.quant) and sharded (parallel/) without a conversion step.
"""

from .registry import ModelDefinition, available_families, build_model, get_family

__all__ = [
    "ModelDefinition",
    "available_families",
    "build_model",
    "get_family",
]
