"""Torch `.pt` checkpoint interop: map reference parameter names/layouts onto
the JAX model tree.

Enables loading the reference's pretrained ``acoustic_en_ipa.pt`` /
``acoustic_ru_en.pt`` checkpoints (reference base.py:38-56 format) for
numerical-parity testing and serving.

Layout rules:
- torch ``Linear.weight`` (out, in)  -> flax ``kernel`` (in, out): transpose
- torch ``Conv1d.weight`` (out, in, k) -> flax ``Conv.kernel`` (k, in, out)
- torch ``LayerNorm.weight``          -> flax ``scale``
- fused ``to_kv`` stays fused (same split convention: [k | v] on the output)
- ``Embedding.weight``               -> ``embedding``
- name remappings (reference -> ours):
  ``aligner.attention.X`` -> ``aligner.X`` (ConvAttention folded into Aligner)
  ``feed_forward.net.0/3`` -> ``feed_forward.fc1/fc2``
  ``rel_pos.learned_logslopes`` -> ``rel_pos.log_slopes``
  ``linear_layer`` -> ``linear``; ``time_embedding.mlp.0/2`` -> fc1/fc2
  ``attention_norm.weight.*``/``.bias.*`` (AdaLN Linears) keep their names
"""

from __future__ import annotations

import re

import numpy as np

# substring rewrites applied in order
_NAME_RULES: list[tuple[str, str]] = [
    (r"^aligner\.attention\.", "aligner."),
    (r"\.feed_forward\.net\.0\.", ".feed_forward.fc1."),
    (r"\.feed_forward\.net\.3\.", ".feed_forward.fc2."),
    (r"\.rel_pos\.learned_logslopes$", ".rel_pos.log_slopes"),
    (r"\.linear_layer\.", ".linear."),
    (r"\.time_embedding\.mlp\.0\.", ".time_embedding.fc1."),
    (r"\.time_embedding\.mlp\.2\.", ".time_embedding.fc2."),
]


def _rename(name: str) -> str | None:
    for pattern, repl in _NAME_RULES:
        name = re.sub(pattern, repl, name)
    # buffers that don't travel as params
    if name.endswith(".freq_emb.freq_scale") or ".attend." in name:
        return None
    return name


def _is_adaln_linear(name: str) -> bool:
    # AdaptiveLayerNorm holds Linear submodules literally named weight/bias:
    # "...attention_norm.weight.weight" is a Linear kernel.
    return bool(re.search(r"_norm\.(weight|bias)\.(weight|bias)$", name))


def convert_torch_state(torch_state: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """{torch name: array} -> {our dotted name: array} with layout fixes."""
    out: dict[str, np.ndarray] = {}
    for name, value in torch_state.items():
        new = _rename(name)
        if new is None:
            continue
        value = np.asarray(value)

        if _is_adaln_linear(new):
            leaf = "kernel" if new.endswith(".weight") else "bias"
            new = new.rsplit(".", 1)[0] + "." + leaf
            if leaf == "kernel":
                value = value.T
        elif new.endswith(".weight"):
            base = new[: -len(".weight")]
            if value.ndim == 3:  # Conv1d (out, in, k) -> (k, in, out)
                new = base + ".kernel"
                value = value.transpose(2, 1, 0)
            elif value.ndim == 2:
                if "embedding" in base.rsplit(".", 1)[-1] or base.endswith("text_embedding") \
                        or base.endswith("speaker_embedding"):
                    new = base + ".embedding"  # (vocab, dim), no transpose
                else:
                    new = base + ".kernel"
                    value = value.T
            elif value.ndim == 1:  # LayerNorm / norm scale
                new = base + ".scale"
            else:
                new = base + ".weight"
        elif new.endswith(".bias") and value.ndim == 1:
            pass  # same name, same layout
        out[new] = value
    # norm scale names: our LayerNorm wrapper nests as `.norm.scale/bias`
    out = {_fix_norm_nesting(k): v for k, v in out.items()}
    return out


def _fix_norm_nesting(name: str) -> str:
    # plain LayerNorm wrapper: attention_norm/feed_forward_norm hold `.norm.`
    # (AdaLN norms keep Linear children named weight/bias -> kernel/bias/scale
    # never collide because AdaLN has no `.scale`)
    m = re.match(r"^(.*(?:attention_norm|feed_forward_norm))\.(scale|bias)$", name)
    if m:
        return f"{m.group(1)}.norm.{m.group(2)}"
    return name


# ---------------------------------------------------------------------------
# Export: our state -> reference torch names/layouts (the exact inverse of
# convert_torch_state, so reference users can move checkpoints BOTH ways).
# The reference's from_pretrained (base.py:38-56) fills any key we don't
# ship — non-persistent buffers like attend masks — from the fresh-init
# model before its strict load, so exporting parameters (+ the pitch stat
# and freq_scale buffers we do carry) is a complete checkpoint.
# ---------------------------------------------------------------------------

# ours -> torch substring rewrites (inverse of _NAME_RULES, applied in order)
_EXPORT_NAME_RULES: list[tuple[str, str]] = [
    (r"^aligner\.", "aligner.attention."),
    (r"\.feed_forward\.fc1\.", ".feed_forward.net.0."),
    (r"\.feed_forward\.fc2\.", ".feed_forward.net.3."),
    (r"\.rel_pos\.log_slopes$", ".rel_pos.learned_logslopes"),
    (r"\.linear\.", ".linear_layer."),
    (r"\.time_embedding\.fc1\.", ".time_embedding.mlp.0."),
    (r"\.time_embedding\.fc2\.", ".time_embedding.mlp.2."),
]


def export_torch_state(state: dict[str, np.ndarray],
                       freq_scale: float | None = 1000.0) -> dict[str, np.ndarray]:
    """{our dotted name: array} -> {reference torch name: array}.

    Inverse of :func:`convert_torch_state`: undoes the kernel/scale/embedding
    leaf renames, re-transposes Linear/Conv kernels into torch layout,
    re-nests the AdaLN Linears, and restores the reference module names.
    ``freq_scale`` synthesizes the flow time embedding's persistent buffer
    (reference embeddings.py:98, default 1000) when the predictor is present.
    """
    out: dict[str, np.ndarray] = {}
    has_predictor_temb = False
    for name, value in state.items():
        value = np.asarray(value)
        # 1) plain-LayerNorm wrapper un-nesting: X_norm.norm.scale -> X_norm.weight
        m = re.match(r"^(.*(?:attention_norm|feed_forward_norm))\.norm\.(scale|bias)$",
                     name)
        if m:
            name = f"{m.group(1)}.{'weight' if m.group(2) == 'scale' else 'bias'}"
        elif re.search(r"_norm\.(weight|bias)\.(kernel|bias)$", name):
            # 2) AdaLN Linears literally named weight/bias
            if name.endswith(".kernel"):
                name = name[: -len(".kernel")] + ".weight"
                value = value.T
        elif name.endswith(".kernel"):
            base = name[: -len(".kernel")]
            name = base + ".weight"
            if value.ndim == 3:   # Conv (k, in, out) -> torch (out, in, k)
                value = value.transpose(2, 1, 0)
            elif value.ndim == 2:  # Linear (in, out) -> torch (out, in)
                value = value.T
        elif name.endswith(".scale") and value.ndim == 1:
            name = name[: -len(".scale")] + ".weight"
        elif name.endswith(".embedding"):
            name = name[: -len(".embedding")] + ".weight"

        for pattern, repl in _EXPORT_NAME_RULES:
            name = re.sub(pattern, repl, name)
        if ".predictor.time_embedding." in name:
            has_predictor_temb = True
        out[name] = value

    if freq_scale is not None and has_predictor_temb:
        out["temporal_adaptor.predictor.time_embedding.freq_emb.freq_scale"] = \
            np.asarray([freq_scale], dtype=np.float32)
    return out


# the reference Act enum (layers.py:10-31) has a single exact-erf "gelu";
# both our flavors map onto it (our default tanh approximation differs by
# <3e-3 absolute — the round-1 parity study; exact users train with
# activation="gelu_exact" and export losslessly)
_TORCH_ACTIVATIONS = {"gelu_exact": "gelu", "gelu": "gelu"}


def export_torch_config(config: dict) -> dict:
    """Model config dict in the reference's schema (they match by
    construction — test_reference_parity drives both sides from one dict);
    only the GELU flavor names differ."""

    def fix(node):
        if isinstance(node, dict):
            return {k: (_TORCH_ACTIVATIONS.get(v, v) if k == "activation" else fix(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [fix(v) for v in node]
        return node

    return fix(config)


def import_torch_config(config: dict) -> dict:
    """Inverse of :func:`export_torch_config`: a reference checkpoint's
    ``activation: gelu`` means torch ``nn.GELU`` (exact erf) — build with our
    ``gelu_exact`` so an imported model is numerically faithful, not the
    tanh approximation (3e-3 absolute apart; test_reference_parity pins the
    exact flavor)."""

    def fix(node):
        if isinstance(node, dict):
            return {k: ("gelu_exact" if k == "activation" and v == "gelu" else fix(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [fix(v) for v in node]
        return node

    return fix(config)
