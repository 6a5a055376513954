"""Convert reference PyTorch ReIDNet checkpoints to flax variables.

Name scheme on the torch side (derived from the reference module attributes,
mmdet3d/models/backbone_net.py:42-89, pointnet2_utils.py:55-473,
attention.py:157-296, lanegcn_nets.py:193-241, ReIDNet.py:125-136):

    backbone.SA_modules.{i}.mlp_convs.{j}.weight        Conv2d (out,in,1,1)
    backbone.SA_modules.{i}.mlp_bns.{j}.{weight,bias,running_mean,running_var}
    backbone.SA_modules.{i}.self_attention.{pos_mlp.0/2,q|k|v_proj,merge,
                                            mlp.0/2,norm1,norm2}
    backbone.FP_modules.{i}.interpolation.{pos_mlp2.0/2,q|k|v_proj,merge,
                                            mlp.0/2,norm1,norm2}
    backbone.FP_modules.{i}.mlp_convs/bns.*             DEAD (never in forward)
    backbone.cov_final.{weight,bias}                    Conv1d (out,in,1)
    cross_stage{1,2}.{pos_mlp.0/2,...}                  corss_attention
    local_stage{1,2}.*_knn                              local_self_attention
    match_head.{j}.(linear1|linear2|norm1|norm2|transform.0|transform.1|weight|bias)
    cls_head/fp_head/shape_head/downsample.{j}.*        Sequential heads

On the flax side the modules deliberately track these names (sa_{i}, fp_{i},
pos_mlp/fc1+fc2, mlp_fc1+mlp_fc2, q_proj/kernel, ...), so conversion is a
string rewrite plus layout transforms:

    torch Linear weight (out,in)         -> kernel (in,out)            (transpose)
    torch Conv1d/2d 1x1 (out,in,1[,1])   -> kernel (in,out)            (squeeze+T)
    torch Conv1d k>1 (out,in,k)          -> kernel (k,in,out)
    torch *Norm weight                   -> scale
    BN running_mean/var                  -> batch_stats .../bn/{mean,var}
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth checkpoint as a flat {name: ndarray} dict.

    Unwraps mmcv's {'state_dict': ...} envelope and strips DDP 'module.'
    prefixes (the checkpoints are saved from MMDistributedDataParallel).
    """
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


# whole-key rewrites applied before leaf rules (PointNet STN / DGCNN blocks,
# reference pointnet.py:10-127 and dgcnn_orig.py:89-152: standalone bnN
# attributes pair with convN/fcN layers; our ConvBNReLU nests conv+bn)
_PREFIX_RULES: List[Tuple[str, str]] = [
    # STN3d / STNkd inside PointNetEncoder
    (r"\.(stn|fstn)\.conv(\d)\.", r".\1.conv\2.conv."),
    (r"\.(stn|fstn)\.bn([123])\.", r".\1.conv\2.bn."),
    (r"\.(stn|fstn)\.bn4\.", r".\1.fc1.bn."),
    (r"\.(stn|fstn)\.bn5\.", r".\1.fc2.bn."),
    (r"\.(stn|fstn)\.fc([12])\.", r".\1.fc\2.conv."),
    # PointNetEncoder trunk (conv3+bn3 stay separate: BN-no-ReLU tail)
    (r"\.feat\.conv([12])\.", r".feat.conv\1.conv."),
    (r"\.feat\.bn([12])\.", r".feat.conv\1.bn."),
    # DGCNN EdgeConv blocks: Sequential(conv,bn,lrelu) with shared bn attrs
    (r"^backbone\.conv([1-4])\.0\.", r"backbone.conv\1.conv."),
    (r"^backbone\.bn([1-4])\.", r"backbone.conv\1.bn."),
    (r"^backbone\.conv5\.0\.", r"backbone.conv5."),
]

# suffix rewrites applied within a module (ordered; first match wins)
_LEAF_RULES: List[Tuple[str, str]] = [
    (r"pos_mlp\.0\.(weight|bias)$", r"pos_mlp/fc1/\1"),
    (r"pos_mlp\.2\.(weight|bias)$", r"pos_mlp/fc2/\1"),
    (r"pos_mlp2\.0\.(weight|bias)$", r"pos_mlp2/fc1/\1"),
    (r"pos_mlp2\.2\.(weight|bias)$", r"pos_mlp2/fc2/\1"),
    (r"pos_mlp_knn\.0\.(weight|bias)$", r"pos_mlp_knn/fc1/\1"),
    (r"pos_mlp_knn\.2\.(weight|bias)$", r"pos_mlp_knn/fc2/\1"),
    (r"mlp\.0\.(weight|bias)$", r"mlp_fc1/\1"),
    (r"mlp\.2\.(weight|bias)$", r"mlp_fc2/\1"),
    (r"mlp_knn\.0\.(weight|bias)$", r"mlp_knn_fc1/\1"),
    (r"mlp_knn\.2\.(weight|bias)$", r"mlp_knn_fc2/\1"),
    (r"mlp_convs\.(\d+)\.(weight|bias)$", r"mlp_\1/conv/\2"),
    (r"mlp_bns\.(\d+)\.(weight|bias|running_mean|running_var)$", r"mlp_\1/bn/\2"),
    (r"transform\.0\.(weight|bias)$", r"transform_linear/\1"),
    (r"transform\.1\.(weight|bias|running_mean|running_var)$", r"transform_norm/\1"),
]

_HEAD_NAMES = ("match_head", "cls_head", "fp_head", "shape_head", "downsample",
               "vis_head")

_SKIP_PATTERNS = [
    r"num_batches_tracked$",
    r"^backbone\.FP_modules\.\d+\.mlp_convs\.",   # constructed but unused
    r"^backbone\.FP_modules\.\d+\.mlp_bns\.",     # (pointnet2_utils.py:442-473)
    # DGCNN Sequential re-registers the shared bn modules; keep the bnN copy
    r"^backbone\.conv\d\.1\.",
]

# cross_lin_attn (image match stages) constructs a pos_mlp that its forward
# never uses (attention.py:312-370) — skip it when converting ImageReIDNet.
IMAGE_SKIP_PATTERNS = [r"^(cross_stage\d|local_stage\d)\.pos_mlp\."]


def _translate(tkey: str, head_children: Dict[str, List[str]]) -> str:
    """torch dotted name -> flax 'collection-relative' slash path."""
    k = tkey
    k = re.sub(r"^backbone\.SA_modules\.(\d+)\.", r"backbone.sa_\1.", k)
    k = re.sub(r"^backbone\.FP_modules\.(\d+)\.interpolation\.",
               r"backbone.fp_\1.interpolation.", k)
    for pat, rep in _PREFIX_RULES:
        if re.search(pat, k):
            k = re.sub(pat, rep, k)
            break
    # Sequential heads: match_head.0.* -> match_head/0_<Type>/* ; the actual
    # child name (0_LinearRes / 1_Linear / ...) is read from the param tree.
    m = re.match(r"^(%s)\.(\d+)\.(.*)$" % "|".join(_HEAD_NAMES), k)
    if m:
        head, idx, rest = m.groups()
        child = None
        for c in head_children.get(head, []):
            if c.split("_", 1)[0] == idx:
                child = c
                break
        if child is None:
            child = idx
        k = f"{head}.{child}.{rest}"

    for pat, rep in _LEAF_RULES:
        if re.search(pat, k):
            k = re.sub(pat, rep, k)
            break
    k = k.replace(".", "/")
    return k


def _transform_value(v: np.ndarray, flax_leaf: str) -> np.ndarray:
    """Apply the torch->flax layout transform for one tensor."""
    if flax_leaf == "kernel":
        if v.ndim == 2:                      # Linear (out,in) -> (in,out)
            return v.T
        if v.ndim == 3:                      # Conv1d (out,in,k)
            if v.shape[-1] == 1:
                return v[:, :, 0].T          # pointwise -> (in,out)
            return v.transpose(2, 1, 0)      # -> (k,in,out)
        if v.ndim == 4:                      # Conv2d (out,in,1,1)
            if v.shape[-1] == 1 and v.shape[-2] == 1:
                return v[:, :, 0, 0].T
            return v.transpose(2, 3, 1, 0)   # (kh,kw,in,out)
    return v


def _leaf_rename(path: str) -> Tuple[str, str]:
    """Map the final torch leaf name to (collection, flax leaf path)."""
    if path.endswith("/running_mean"):
        return "batch_stats", path.replace("/running_mean", "/mean")
    if path.endswith("/running_var"):
        return "batch_stats", path.replace("/running_var", "/var")
    return "params", path


def _tree_paths(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_paths(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def _set_path(tree: Dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = value


def convert_reidnet_state_dict(
    state_dict: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    strict: bool = True,
    extra_skip_patterns: Tuple[str, ...] = (),
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Convert a reference ReIDNet torch state dict into flax `variables`.

    Args:
        state_dict: flat torch {name: ndarray} (from `load_torch_state_dict`).
        variables: template variables from `model.init(...)` — defines the
            expected tree structure and shapes.
        strict: raise if any template leaf stays unfilled or a non-skipped
            torch key finds no target.
    Returns:
        (new_variables, report) where report lists 'unmatched_torch' and
        'unfilled_flax' paths.
    """
    import jax

    # start from the template (unfilled leaves keep their init values and are
    # listed in the report)
    new_vars = jax.tree_util.tree_map(np.asarray, variables)
    template = {c: _tree_paths(t) for c, t in variables.items()}

    # BN leaves named scale/bias in flax but weight/bias in torch; norm leaves too
    def flaxify_leaf(path: str) -> str:
        parts = path.rsplit("/", 1)
        if parts[-1] == "weight":
            # Dense/Conv weight -> kernel; Norm weight -> scale: disambiguate
            # against the template.
            for cand, leaf in ((parts[0] + "/kernel", "kernel"),
                               (parts[0] + "/scale", "scale")):
                if cand in template["params"]:
                    return cand
            return parts[0] + "/kernel"
        return path

    head_children = {}
    for head in _HEAD_NAMES:
        sub = variables.get("params", {}).get(head)
        if isinstance(sub, dict):
            head_children[head] = list(sub.keys())

    report = {"unmatched_torch": [], "unfilled_flax": []}
    filled = {c: set() for c in template}

    skip = list(_SKIP_PATTERNS) + list(extra_skip_patterns)
    for tkey, tval in state_dict.items():
        if any(re.search(p, tkey) for p in skip):
            continue
        path = _translate(tkey, head_children)
        collection, path = _leaf_rename(path)
        if collection == "params":
            path = flaxify_leaf(path)
            if path.endswith("/weight"):  # norm weight in batch-stats modules
                path = path[: -len("weight")] + "scale"
        if collection not in template or path not in template[collection]:
            report["unmatched_torch"].append(f"{tkey} -> {collection}:{path}")
            continue
        leaf = path.rsplit("/", 1)[-1]
        val = _transform_value(np.asarray(tval), leaf)
        want = template[collection][path].shape
        if tuple(val.shape) != tuple(want):
            report["unmatched_torch"].append(
                f"{tkey} -> {collection}:{path} shape {val.shape} != {want}")
            continue
        _set_path(new_vars[collection], path,
                  val.astype(np.asarray(template[collection][path]).dtype))
        filled[collection].add(path)

    for c, paths in template.items():
        for p in paths:
            if p not in filled[c]:
                report["unfilled_flax"].append(f"{c}:{p}")

    if strict and (report["unmatched_torch"] or report["unfilled_flax"]):
        raise ValueError(
            "checkpoint conversion mismatch:\n  unmatched torch keys:\n    "
            + "\n    ".join(report["unmatched_torch"][:20])
            + "\n  unfilled flax leaves:\n    "
            + "\n    ".join(report["unfilled_flax"][:20]))

    import jax.numpy as jnp
    new_vars = jax.tree_util.tree_map(jnp.asarray, new_vars)
    return new_vars, report


def convert_image_reidnet_state_dict(
    state_dict: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    strict: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Convert a reference ImageReIDNet checkpoint (HF ViT backbone + match
    stages/heads, ReIDNet.py:838-1397) into flax variables.

    The HF backbone lives under 'backbone.' — and one level deeper under
    'backbone.deit.' for DeiTForImageClassificationWithTeacher checkpoints
    (get_image_model, ReIDNet.py:811-834); classifier heads of the teacher
    model are dropped.
    """
    from .hf_vit import convert_hf_vit_state_dict

    backbone_sd, rest_sd = {}, {}
    for k, v in state_dict.items():
        if k.startswith("backbone."):
            kk = k[len("backbone."):]
            if kk.startswith("deit."):
                kk = kk[len("deit."):]
            if kk.startswith(("cls_classifier", "distillation_classifier",
                              "pooler.")):
                continue
            backbone_sd[kk] = v
        else:
            rest_sd[k] = v

    import jax
    import jax.numpy as jnp
    new_backbone, unmatched_bb = convert_hf_vit_state_dict(
        backbone_sd, variables["params"]["backbone"])

    rest_vars = {c: ({k: v for k, v in t.items() if k != "backbone"}
                     if c == "params" else t)
                 for c, t in variables.items()}
    new_vars, report = convert_reidnet_state_dict(
        rest_sd, rest_vars, strict=False,
        extra_skip_patterns=tuple(IMAGE_SKIP_PATTERNS))
    report["unmatched_torch"].extend(unmatched_bb)
    new_vars["params"]["backbone"] = jax.tree_util.tree_map(
        jnp.asarray, new_backbone)

    if strict and (report["unmatched_torch"] or report["unfilled_flax"]):
        raise ValueError(
            "image checkpoint conversion mismatch:\n  unmatched:\n    "
            + "\n    ".join(report["unmatched_torch"][:20])
            + "\n  unfilled:\n    " + "\n    ".join(report["unfilled_flax"][:20]))
    return new_vars, report
