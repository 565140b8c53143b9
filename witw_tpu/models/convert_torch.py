"""PyTorch checkpoint -> Flax parameter conversion.

Two use cases:
1. Bootstrapping the FOV-DSM towers from torchvision's pretrained VGG16
   (the reference pulls it from torch.hub at runtime, model/cvig_fov.py:256 —
   this environment has no network, so conversion runs offline whenever a
   ``vgg16-*.pth`` state dict file is available).
2. Loading checkpoints produced by the reference's own training
   (./weights/fov_{fov}_{surface,overhead}_best.pth, cvig_fov.py:485-486;
   ./weights/{surface,overhead}_best.pth, cvig_baseline.py:399-402) so users
   can migrate trained models into this framework.

Layout: torch convs are OIHW, Flax kernels are HWIO -> transpose (2, 3, 1, 0).
Reference tower state-dict keys look like ``model.features.17.layer.weight``
when wrapped by HorizCircPadding/AddDropout (cvig_fov.py:212-245) and
``model.features.0.weight`` when bare; both are handled.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from witw_tpu.models.backbones.vgg16 import VGG16_CONVS
from witw_tpu.models.fov_dsm import HEAD_CONVS


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(_to_numpy(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _strip_wrappers(key: str) -> str:
    """Normalize keys from HorizCircPadding/AddDropout-wrapped layers."""
    return key.replace(".layer.", ".").replace("model.features.", "features.")


def convert_fov_dsm_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a VGG16 or reference FOV-DSM tower state dict to Flax params.

    Accepts either torchvision's ``vgg16`` state dict (features.N.{weight,bias})
    or a reference tower checkpoint (model.features.N[.layer].{weight,bias}).
    Head convs live at torch feature indices 23/25/27.
    Returns a Flax params dict for :class:`witw_tpu.models.FovDsm`.
    """
    flat = {_strip_wrappers(k): v for k, v in state_dict.items()}
    vgg: Dict[str, Any] = {}
    top: Dict[str, Any] = {"vgg": vgg}

    for torch_idx, _ in VGG16_CONVS:
        w = flat.get(f"features.{torch_idx}.weight")
        b = flat.get(f"features.{torch_idx}.bias")
        if w is None:
            raise KeyError(f"missing features.{torch_idx}.weight in state dict")
        vgg[f"conv_{torch_idx}"] = {
            "kernel": _conv_kernel(w),
            "bias": _to_numpy(b),
        }

    for name, _, _, _ in HEAD_CONVS:
        torch_idx = int(name.split("_")[1])
        w = flat.get(f"features.{torch_idx}.weight")
        if w is None:
            continue  # plain torchvision VGG16 has no head convs
        top[name] = {
            "kernel": _conv_kernel(w),
            "bias": _to_numpy(flat[f"features.{torch_idx}.bias"]),
        }
    return top


def merge_pretrained_vgg(params: Dict[str, Any], converted: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay converted weights onto freshly-initialized FovDsm params.

    For the 5-channel semantic conv1_1, RGB weights are copied into the first
    three input channels and the rest keep their fresh init (reference
    cvig_semantic.py:301-303).
    """
    import copy

    out = copy.deepcopy(params)
    for key, sub in converted.items():
        if key == "vgg":
            for conv_name, kv in sub.items():
                dst = out["vgg"][conv_name]
                src_k = np.asarray(kv["kernel"])
                dst_k = np.asarray(dst["kernel"])
                if src_k.shape == dst_k.shape:
                    dst["kernel"] = src_k.astype(dst_k.dtype)
                elif (
                    conv_name == "conv_0"
                    and src_k.shape[2] < dst_k.shape[2]
                    and src_k.shape[:2] + src_k.shape[3:] == dst_k.shape[:2] + dst_k.shape[3:]
                ):
                    merged = np.array(dst_k)
                    merged[:, :, : src_k.shape[2], :] = src_k
                    dst["kernel"] = merged.astype(dst_k.dtype)
                else:
                    raise ValueError(
                        f"shape mismatch for {conv_name}: {src_k.shape} vs {dst_k.shape}"
                    )
                dst["bias"] = np.asarray(kv["bias"]).astype(np.asarray(dst["bias"]).dtype)
        elif key in out:
            out[key] = {
                "kernel": np.asarray(sub["kernel"]),
                "bias": np.asarray(sub["bias"]),
            }
    return out


def convert_baseline_state_dict(
    state_dict: Mapping[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference baseline tower checkpoint (conv1..conv7, bn1..bn7;
    cvig_baseline.py:240-253) to Flax (params, batch_stats)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for key, val in state_dict.items():
        m = re.match(r"(?:module\.)?(conv|bn)(\d)\.(\w+)$", key)
        if not m:
            continue
        kind, idx, field = m.groups()
        name = f"{kind}{idx}"
        if kind == "conv":
            if field == "weight":
                params.setdefault(name, {})["kernel"] = _conv_kernel(val)
            elif field == "bias":
                params.setdefault(name, {})["bias"] = _to_numpy(val)
        else:
            if field == "weight":
                params.setdefault(name, {})["scale"] = _to_numpy(val)
            elif field == "bias":
                params.setdefault(name, {})["bias"] = _to_numpy(val)
            elif field == "running_mean":
                batch_stats.setdefault(name, {})["mean"] = _to_numpy(val)
            elif field == "running_var":
                batch_stats.setdefault(name, {})["var"] = _to_numpy(val)
    return params, batch_stats


def load_torch_file(path: str) -> Mapping[str, Any]:
    """Load a .pth state dict (requires torch, available CPU-only here)."""
    import torch

    obj = torch.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Inverse of the converter CLI's npz layout ('a/b/c' keys -> nested dict)."""
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return out


def main(argv=None) -> None:
    """Offline converter CLI: ``python -m witw_tpu.models.convert_torch in.pth out.npz``.

    Converts torchvision VGG16 / reference FOV-DSM tower checkpoints
    (``--family fov``, the default) or reference baseline tower checkpoints
    (``--family baseline``) into an npz of Flax params with '/'-joined keys
    (load with np.load + :func:`unflatten`). Replaces the reference's runtime
    torch.hub download (model/cvig_fov.py:256) with a one-time offline step.
    """
    import argparse

    p = argparse.ArgumentParser(description="torch .pth -> Flax params .npz")
    p.add_argument("src", help="torch state-dict file (.pth)")
    p.add_argument("dst", help="output .npz")
    p.add_argument("--family", choices=["fov", "baseline"], default="fov")
    args = p.parse_args(argv)

    sd = load_torch_file(args.src)
    if args.family == "fov":
        tree: Dict[str, Any] = convert_fov_dsm_state_dict(sd)
    else:
        params, batch_stats = convert_baseline_state_dict(sd)
        tree = {"params": params, "batch_stats": batch_stats}
    flat = _flatten(tree)
    np.savez(args.dst, **flat)
    print(f"wrote {args.dst}: {len(flat)} arrays")


if __name__ == "__main__":
    main()
