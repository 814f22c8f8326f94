"""Shrink a checkpoint for committing: f32 weights -> f16, optimizer dropped.

The convergence-run artifact (docs/TRAIN_R3.md) commits its trained model;
f16 halves the file and is transparent to `from_pretrained` (load_params
feeds arrays to f32/bf16 modules, numerically irrelevant for inference
evidence).

Usage: python tools/shrink_checkpoint.py in.ckpt out.ckpt
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from isp_tts_tpu.training.checkpoint import load_checkpoint, save_checkpoint


def shrink(src: str, dst: str, drop_prefixes: tuple = ()) -> None:
    """``drop_prefixes`` removes whole parameter subtrees (e.g. a GAN
    checkpoint's ``discriminator.`` — serving needs only the generator;
    ``load_params`` backfills dropped keys from fresh init with a warning)."""
    ckpt = load_checkpoint(src)
    ckpt.pop("optimizer", None)
    if drop_prefixes:
        state = ckpt["model"]["state"]
        for k in [k for k in state if k.startswith(tuple(drop_prefixes))]:
            del state[k]

    def cast(tree):
        if isinstance(tree, dict):
            return {k: cast(v) for k, v in tree.items()}
        if isinstance(tree, np.ndarray) and tree.dtype == np.float32:
            return tree.astype(np.float16)
        return tree

    ckpt["model"]["state"] = cast(ckpt["model"]["state"])
    ckpt["format"] = str(ckpt.get("format", "isp_tts_tpu.v1")) + "+f16"
    save_checkpoint(dst, ckpt)
    a, b = Path(src).stat().st_size, Path(dst).stat().st_size
    print(f"{src} ({a/1e6:.1f} MB) -> {dst} ({b/1e6:.1f} MB)")


if __name__ == "__main__":
    shrink(sys.argv[1], sys.argv[2])
