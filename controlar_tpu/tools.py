"""Checkpoint/zoo utilities (ref tools/: convert_pytorch_lightning_to_torch.py,
push_gpt_to_hf.py, check_image_codes.py).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def convert_lightning_checkpoint(src: str, dst: str) -> None:
    """PyTorch-Lightning ckpt -> plain {'model': state_dict} .pt
    (ref tools/convert_pytorch_lightning_to_torch.py)."""
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    torch.save({"model": sd}, dst)


def export_params_npz(params, path: str) -> None:
    """Save a JAX param pytree as a flat .npz (portable, torch-free)."""
    import jax

    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                visit(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(tree)

    visit("", jax.device_get(params))
    np.savez(path, **flat)


def import_params_npz(path: str) -> Dict:
    """Inverse of export_params_npz (lists come back as dicts of indices).

    np.savez has no format code for ml_dtypes, so bfloat16 arrays round-trip
    through a raw 2-byte void dtype ('V2'); re-view them as bfloat16 here.
    """
    import ml_dtypes

    flat = np.load(path)
    root: Dict = {}
    for key in flat.files:
        arr = flat[key]
        if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
            arr = arr.view(ml_dtypes.bfloat16)
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root


def check_code_tree(tree_dir: str, expected_len: Optional[int] = None) -> Dict:
    """Sanity-check an extracted code tree (ref tools/check_image_codes.py):
    counts, contiguity of indices, token-range stats."""
    code_dir = os.path.join(tree_dir, "code")
    files = os.listdir(code_dir)
    n = len(files)
    missing = [i for i in range(n) if f"{i}.npy" not in set(files)]
    mn, mx = 1 << 30, -1
    for i in range(0, n, max(n // 64, 1)):
        if f"{i}.npy" in set(files):
            arr = np.load(os.path.join(code_dir, f"{i}.npy"))
            mn, mx = min(mn, int(arr.min())), max(mx, int(arr.max()))
    report = {"count": n, "missing": missing, "token_min": mn, "token_max": mx}
    if expected_len is not None:
        report["complete"] = n == expected_len and not missing
    return report


def save_hub_folder(params, config_dict: Dict, out_dir: str,
                    model_card: Optional[str] = None) -> str:
    """Write a hub-layout folder: params.safetensors (flat slash-joined
    keys), config.json, README.md — the JAX analogue of the reference's
    PyTorchModelHubMixin wrapper (ref tokenizer_image/vq_model_hf.py:1-5).
    Returns the folder path; `push_to_hub` uploads it when credentials and
    network exist."""
    import json

    import jax
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                visit(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(jax.device_get(tree))

    visit("", params)
    save_file(flat, os.path.join(out_dir, "params.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config_dict, f, indent=1)
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write(model_card or "# controlar_tpu checkpoint\n")
    return out_dir


def load_hub_folder(out_dir: str):
    """Inverse of save_hub_folder: (params_tree, config_dict)."""
    import json

    from safetensors.numpy import load_file

    flat = load_file(os.path.join(out_dir, "params.safetensors"))
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    with open(os.path.join(out_dir, "config.json")) as f:
        config = json.load(f)
    return listify(tree), config


def push_to_hub(folder: str, repo_id: str, token: Optional[str] = None) -> str:
    """Upload a save_hub_folder() folder (requires network + credentials;
    the folder itself is the offline artifact)."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, exist_ok=True)
    api.upload_folder(folder_path=folder, repo_id=repo_id)
    return f"https://huggingface.co/{repo_id}"
