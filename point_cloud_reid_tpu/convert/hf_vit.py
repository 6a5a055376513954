"""Convert HuggingFace DeiT/BEiT torch weights to the flax ViT backbone.

The reference's image branch uses HF torch backbones directly
(get_image_model, ReIDNet.py:811-834: facebook/deit-{tiny,base}-distilled-
patch16-224, microsoft/beit-base-patch16-224); a released ImageReIDNet
checkpoint therefore contains HF-named weights under the 'backbone.' prefix.
This maps them onto models/vit.py:

    embeddings.cls_token / distillation_token / position_embeddings
    embeddings.patch_embeddings.projection.{weight,bias}
    encoder.layer.{i}.layernorm_before/after          -> block_i/norm1, norm2
    encoder.layer.{i}.attention.attention.{query,key,value}  -> fused qkv
    encoder.layer.{i}.attention.output.dense          -> block_i/attn/proj
    encoder.layer.{i}.intermediate.dense              -> block_i/mlp_fc1
    encoder.layer.{i}.output.dense                    -> block_i/mlp_fc2
    encoder.layer.{i}.lambda_1 / lambda_2             -> gamma_1 / gamma_2 (BEiT)
    layernorm                                         -> norm (BEiT only —
        DeiT taps hidden_states[-1], pre-final-LN, so those weights are dead)
    relative_position_bias_table                      -> rel_pos_table (BEiT)
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np


def convert_hf_vit_state_dict(
    sd: Dict[str, np.ndarray], params: Dict, prefix: str = ""
) -> Tuple[Dict, List[str]]:
    """Fill the ViT param subtree from an HF state dict.

    Args:
        sd: flat torch state dict (HF names, optionally prefixed).
        params: the ViT 'params' subtree from model.init (mutated copy
            returned).
        prefix: strip this prefix from torch keys (e.g. 'backbone.').
    Returns:
        (filled params subtree, unmatched torch keys)
    """
    import jax
    out = jax.tree_util.tree_map(np.asarray, params)
    unmatched: List[str] = []

    # collect q/k/v per layer to fuse
    qkv: Dict[int, Dict[str, np.ndarray]] = {}

    def put(path: List[str], val: np.ndarray):
        node = out
        for p in path[:-1]:
            node = node[p]
        want = node[path[-1]].shape
        assert tuple(val.shape) == tuple(want), \
            f"{'/'.join(path)}: {val.shape} != {want}"
        node[path[-1]] = val.astype(node[path[-1]].dtype)

    for key, v in sd.items():
        if prefix and not key.startswith(prefix):
            unmatched.append(key)
            continue
        k = key[len(prefix):]
        v = np.asarray(v)
        try:
            if k == "embeddings.cls_token":
                put(["cls_token"], v)
            elif k == "embeddings.distillation_token":
                put(["dist_token"], v)
            elif k == "embeddings.position_embeddings":
                put(["pos_embed"], v)
            elif k == "embeddings.patch_embeddings.projection.weight":
                put(["patch_embed", "kernel"], v.transpose(2, 3, 1, 0))
            elif k == "embeddings.patch_embeddings.projection.bias":
                put(["patch_embed", "bias"], v)
            elif k == "layernorm.weight":
                if "norm" in out:
                    put(["norm", "scale"], v)     # BEiT; dead for DeiT
            elif k == "layernorm.bias":
                if "norm" in out:
                    put(["norm", "bias"], v)
            elif "relative_position_bias_table" in k:
                put(["rel_pos_table"], v)
            elif "relative_position_index" in k or k.startswith("pooler."):
                pass                               # recomputed / unused
            elif (m := re.match(
                    r"encoder\.layer\.(\d+)\.(.*)$", k)):
                i, rest = int(m.group(1)), m.group(2)
                blk = f"block_{i}"
                if (m2 := re.match(
                        r"attention\.attention\.(query|key|value)\.(weight|bias)$",
                        rest)):
                    qkv.setdefault(i, {})[f"{m2.group(1)}.{m2.group(2)}"] = v
                elif rest == "attention.attention.relative_position_bias.relative_position_bias_table":  # noqa: E501
                    put(["rel_pos_table"], v)      # per-layer variant: last wins
                elif "relative_position_index" in rest:
                    pass
                elif rest == "attention.output.dense.weight":
                    put([blk, "attn", "proj", "kernel"], v.T)
                elif rest == "attention.output.dense.bias":
                    put([blk, "attn", "proj", "bias"], v)
                elif rest == "layernorm_before.weight":
                    put([blk, "norm1", "scale"], v)
                elif rest == "layernorm_before.bias":
                    put([blk, "norm1", "bias"], v)
                elif rest == "layernorm_after.weight":
                    put([blk, "norm2", "scale"], v)
                elif rest == "layernorm_after.bias":
                    put([blk, "norm2", "bias"], v)
                elif rest == "intermediate.dense.weight":
                    put([blk, "mlp_fc1", "kernel"], v.T)
                elif rest == "intermediate.dense.bias":
                    put([blk, "mlp_fc1", "bias"], v)
                elif rest == "output.dense.weight":
                    put([blk, "mlp_fc2", "kernel"], v.T)
                elif rest == "output.dense.bias":
                    put([blk, "mlp_fc2", "bias"], v)
                elif rest == "lambda_1":
                    put([blk, "gamma_1"], v)
                elif rest == "lambda_2":
                    put([blk, "gamma_2"], v)
                else:
                    unmatched.append(key)
            else:
                unmatched.append(key)
        except (KeyError, AssertionError) as e:  # pragma: no cover
            unmatched.append(f"{key} ({e})")

    # fuse q/k/v into the single qkv projection
    for i, parts in qkv.items():
        blk = f"block_{i}"
        dim = parts["query.weight"].shape[1]
        Wq, Wk, Wv = (parts["query.weight"], parts["key.weight"],
                      parts["value.weight"])
        kernel = np.concatenate([Wq.T, Wk.T, Wv.T], axis=1)       # (in, 3C)
        bq = parts.get("query.bias", np.zeros(dim, Wq.dtype))
        bk = parts.get("key.bias", np.zeros(dim, Wq.dtype))       # BEiT: no k bias
        bv = parts.get("value.bias", np.zeros(dim, Wq.dtype))
        put([blk, "attn", "qkv", "kernel"], kernel)
        put([blk, "attn", "qkv", "bias"], np.concatenate([bq, bk, bv]))

    return out, unmatched
