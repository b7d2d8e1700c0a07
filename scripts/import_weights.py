#!/usr/bin/env python3
"""Import pretrained weights (torch state dicts) into the framework's
npz param-pytree format.

Reference counterpart: the model export scripts (models/import_resnet.py,
import_vit.py, import_bert-base-uncased.py) which freeze torchvision/HF
models to TorchScript. Here the conversion runs the other way: a torch
``state_dict`` (torchvision ResNet naming, torchvision ViT naming, or HF
BERT naming) is mapped into the functional-JAX param tree and saved with
``models.registry.save_params``.

Usage:
  python scripts/import_weights.py --family resnet18 \
      --state-dict resnet18.pt --out resnet18.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from starpu_inference_server_tpu.models import build_model  # noqa: E402
from starpu_inference_server_tpu.models.registry import save_params  # noqa: E402
from starpu_inference_server_tpu.utils.config import ModelSettings  # noqa: E402


def _conv(t):
    """torch OIHW -> HWIO."""
    return np.asarray(t).transpose(2, 3, 1, 0).astype(np.float32)


def _fc(t):
    """torch [out, in] -> [in, out]."""
    return np.asarray(t).T.astype(np.float32)


def _vec(t):
    return np.asarray(t).astype(np.float32)


def _bn(sd, prefix):
    return {
        "gamma": _vec(sd[f"{prefix}.weight"]),
        "beta": _vec(sd[f"{prefix}.bias"]),
        "mean": _vec(sd[f"{prefix}.running_mean"]),
        "var": _vec(sd[f"{prefix}.running_var"]),
    }


def map_resnet(sd, params):
    """torchvision ResNet state dict -> our tree (same topology)."""
    out = {"conv1": {"w": _conv(sd["conv1.weight"])}, "bn1": _bn(sd, "bn1")}
    for stage in (1, 2, 3, 4):
        blocks = []
        i = 0
        while f"layer{stage}.{i}.conv1.weight" in sd:
            prefix = f"layer{stage}.{i}"
            block = {
                "conv1": {"w": _conv(sd[f"{prefix}.conv1.weight"])},
                "bn1": _bn(sd, f"{prefix}.bn1"),
                "conv2": {"w": _conv(sd[f"{prefix}.conv2.weight"])},
                "bn2": _bn(sd, f"{prefix}.bn2"),
            }
            if f"{prefix}.conv3.weight" in sd:  # bottleneck
                block["conv3"] = {"w": _conv(sd[f"{prefix}.conv3.weight"])}
                block["bn3"] = _bn(sd, f"{prefix}.bn3")
            if f"{prefix}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": {"w": _conv(sd[f"{prefix}.downsample.0.weight"])},
                    "bn": _bn(sd, f"{prefix}.downsample.1"),
                }
            blocks.append(block)
            i += 1
        out[f"layer{stage}"] = blocks
    out["fc"] = {"w": _fc(sd["fc.weight"]), "b": _vec(sd["fc.bias"])}
    return out


def map_bert(sd, params):
    """HF BertModel state dict -> our tree."""
    pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
    out = {
        "embeddings": {
            "word": {"w": _vec(sd[f"{pre}embeddings.word_embeddings.weight"])},
            "position": {"w": _vec(sd[f"{pre}embeddings.position_embeddings.weight"])},
            "token_type": {"w": _vec(sd[f"{pre}embeddings.token_type_embeddings.weight"])},
            "ln": {
                "gamma": _vec(sd[f"{pre}embeddings.LayerNorm.weight"]),
                "beta": _vec(sd[f"{pre}embeddings.LayerNorm.bias"]),
            },
        },
        "layers": [],
    }
    i = 0
    while f"{pre}encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"{pre}encoder.layer.{i}"
        out["layers"].append({
            "attn": {
                "q": {"w": _fc(sd[f"{p}.attention.self.query.weight"]),
                      "b": _vec(sd[f"{p}.attention.self.query.bias"])},
                "k": {"w": _fc(sd[f"{p}.attention.self.key.weight"]),
                      "b": _vec(sd[f"{p}.attention.self.key.bias"])},
                "v": {"w": _fc(sd[f"{p}.attention.self.value.weight"]),
                      "b": _vec(sd[f"{p}.attention.self.value.bias"])},
                "o": {"w": _fc(sd[f"{p}.attention.output.dense.weight"]),
                      "b": _vec(sd[f"{p}.attention.output.dense.bias"])},
            },
            "attn_ln": {
                "gamma": _vec(sd[f"{p}.attention.output.LayerNorm.weight"]),
                "beta": _vec(sd[f"{p}.attention.output.LayerNorm.bias"]),
            },
            "ffn": {
                "fc1": {"w": _fc(sd[f"{p}.intermediate.dense.weight"]),
                        "b": _vec(sd[f"{p}.intermediate.dense.bias"])},
                "fc2": {"w": _fc(sd[f"{p}.output.dense.weight"]),
                        "b": _vec(sd[f"{p}.output.dense.bias"])},
            },
            "ffn_ln": {
                "gamma": _vec(sd[f"{p}.output.LayerNorm.weight"]),
                "beta": _vec(sd[f"{p}.output.LayerNorm.bias"]),
            },
        })
        i += 1
    return out


def map_vit(sd, params):
    """torchvision ViT state dict -> our tree."""
    out = {
        "patch_embed": {
            "w": _conv(sd["conv_proj.weight"]),
            "b": _vec(sd["conv_proj.bias"]),
        },
        "cls_token": _vec(sd["class_token"]),
        "pos_embed": _vec(sd["encoder.pos_embedding"]),
        "blocks": [],
        "ln_final": {
            "gamma": _vec(sd["encoder.ln.weight"]),
            "beta": _vec(sd["encoder.ln.bias"]),
        },
        "head": {
            "w": _fc(sd["heads.head.weight"]),
            "b": _vec(sd["heads.head.bias"]),
        },
    }
    i = 0
    while f"encoder.layers.encoder_layer_{i}.ln_1.weight" in sd:
        p = f"encoder.layers.encoder_layer_{i}"
        qkv_w = np.asarray(sd[f"{p}.self_attention.in_proj_weight"])
        qkv_b = np.asarray(sd[f"{p}.self_attention.in_proj_bias"])
        dim = qkv_w.shape[1]
        out["blocks"].append({
            "ln1": {"gamma": _vec(sd[f"{p}.ln_1.weight"]),
                    "beta": _vec(sd[f"{p}.ln_1.bias"])},
            "attn": {
                "q": {"w": qkv_w[:dim].T.astype(np.float32),
                      "b": qkv_b[:dim].astype(np.float32)},
                "k": {"w": qkv_w[dim:2*dim].T.astype(np.float32),
                      "b": qkv_b[dim:2*dim].astype(np.float32)},
                "v": {"w": qkv_w[2*dim:].T.astype(np.float32),
                      "b": qkv_b[2*dim:].astype(np.float32)},
                "o": {"w": _fc(sd[f"{p}.self_attention.out_proj.weight"]),
                      "b": _vec(sd[f"{p}.self_attention.out_proj.bias"])},
            },
            "ln2": {"gamma": _vec(sd[f"{p}.ln_2.weight"]),
                    "beta": _vec(sd[f"{p}.ln_2.bias"])},
            "mlp": {
                "fc1": {"w": _fc(sd[f"{p}.mlp.0.weight"]),
                        "b": _vec(sd[f"{p}.mlp.0.bias"])},
                "fc2": {"w": _fc(sd[f"{p}.mlp.3.weight"]),
                        "b": _vec(sd[f"{p}.mlp.3.bias"])},
            },
        })
        i += 1
    return out


def map_llama(sd, params):
    """HF LlamaForCausalLM / LlamaModel state dict -> our fused layout
    (qkv and gate_up concatenated along the output axis)."""
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    out = {
        "embed": {"w": _vec(sd[f"{pre}embed_tokens.weight"])},
        "layers": [],
        "final_norm": {"gamma": _vec(sd[f"{pre}norm.weight"])},
    }
    head_key = "lm_head.weight"
    if head_key in sd:
        out["lm_head"] = {"w": _fc(sd[head_key])}
    else:  # tied embeddings
        out["lm_head"] = {"w": _vec(sd[f"{pre}embed_tokens.weight"]).T.copy()}
    i = 0
    while f"{pre}layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"{pre}layers.{i}"
        qkv = np.concatenate(
            [
                _fc(sd[f"{p}.self_attn.q_proj.weight"]),
                _fc(sd[f"{p}.self_attn.k_proj.weight"]),
                _fc(sd[f"{p}.self_attn.v_proj.weight"]),
            ],
            axis=1,
        )
        gate_up = np.concatenate(
            [
                _fc(sd[f"{p}.mlp.gate_proj.weight"]),
                _fc(sd[f"{p}.mlp.up_proj.weight"]),
            ],
            axis=1,
        )
        out["layers"].append({
            "attn_norm": {"gamma": _vec(sd[f"{p}.input_layernorm.weight"])},
            "attn": {
                "qkv": {"w": qkv},
                "o": {"w": _fc(sd[f"{p}.self_attn.o_proj.weight"])},
            },
            "mlp_norm": {"gamma": _vec(sd[f"{p}.post_attention_layernorm.weight"])},
            "mlp": {
                "gate_up": {"w": gate_up},
                "down": {"w": _fc(sd[f"{p}.mlp.down_proj.weight"])},
            },
        })
        i += 1
    return out


MAPPERS = {
    "resnet": map_resnet,
    "bert": map_bert,
    "vit": map_vit,
    "llama": map_llama,
}


def mapper_for(family: str):
    if family.startswith(("resnet", "resnext", "wide_resnet")):
        return map_resnet
    if family.startswith("bert"):
        return map_bert
    if family.startswith("vit"):
        return map_vit
    if family.startswith("llama"):
        return map_llama
    raise SystemExit(f"no state-dict mapper for family {family!r}")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", required=True)
    parser.add_argument("--state-dict", required=True,
                        help="torch .pt/.pth/.bin state-dict file")
    parser.add_argument("--out", required=True, help="output .npz path")
    parser.add_argument("--options", default="{}",
                        help="JSON model options (depth/width overrides "
                             "for the reference build)")
    args = parser.parse_args()

    import torch

    sd = torch.load(args.state_dict, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    import json

    reference = build_model(
        ModelSettings(family=args.family,
                      options=json.loads(args.options)),
        seed=0,
    )
    tree = mapper_for(args.family)(sd, reference.params)
    save_params(args.out, tree)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
