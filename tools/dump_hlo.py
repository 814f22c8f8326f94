"""Dump the optimized HLO of the bench_train step and roll up copy ops.

Layout-copy archaeology (VERDICT r2 weak #4): compiles the exact program
tools/bench_train.py times (hits the persistent compile cache when warm) and
prints every `copy`/`copy-start` in the optimized module with its shape,
layouts, producer and consumers, so the {1,2,0}<->{2,1,0} boundaries around
the Pallas kernels can be attributed to specific graph edges.

Usage:
  python tools/dump_hlo.py                 # print copy rollup
  python tools/dump_hlo.py --full out.hlo  # also write the whole module
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np  # noqa: F401

from isp_tts_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--text-len", type=int, default=128)
    ap.add_argument("--mel-len", type=int, default=768)
    ap.add_argument("--n-iter", type=int, default=12)
    ap.add_argument("--full", default=None, help="write full HLO text here")
    ap.add_argument("--threefry", action="store_true")
    args = ap.parse_args()

    if not args.threefry:
        jax.config.update("jax_default_prng_impl", "rbg")

    from flax import nnx

    from tools.bench_train import build

    model, criterion, tx, batch = build(args.batch, args.text_len, args.mel_len)
    graphdef, state = nnx.split(model)
    params = nnx.state(model, nnx.Param)
    opt_state = tx.init(params)

    import jax.numpy as jnp

    def one_step(model_state, opt_state, step):
        m = nnx.merge(graphdef, model_state)

        def loss_fn(mm):
            inputs = mm.prepare_inputs(batch)
            outputs = mm(**inputs)
            loss, losses = criterion(inputs, outputs, step)
            return loss.astype(jnp.float32), losses

        (loss, _losses), grads = nnx.value_and_grad(loss_fn, has_aux=True)(m)
        p = nnx.state(m, nnx.Param)
        updates, opt_state = tx.update(grads, opt_state, p)
        nnx.update(m, jax.tree.map(lambda a, b: a + b, p, updates))
        _gd, new_state = nnx.split(m)
        return new_state, opt_state, loss

    @jax.jit
    def many(model_state, opt_state):
        def body(carry, step):
            ms, os_ = carry
            ms, os_, loss = one_step(ms, os_, step)
            return (ms, os_), loss

        (_ms, _os), losses = jax.lax.scan(
            body, (model_state, opt_state),
            jnp.arange(args.n_iter, dtype=jnp.int32))
        return losses

    compiled = many.lower(state, opt_state).compile()
    text = compiled.as_text()
    if args.full:
        with open(args.full, "w") as f:
            f.write(text)
        print(f"full HLO ({len(text)/1e6:.1f} MB) -> {args.full}")

    # index: instruction name -> its defining line, and users
    def_line: dict[str, str] = {}
    users: dict[str, list[str]] = defaultdict(list)
    name_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=")
    for line in text.splitlines():
        m = name_re.match(line)
        if not m:
            continue
        name = m.group(1)
        def_line[name] = line.strip()
        for op in re.findall(r"%([\w.\-]+)", line.split("=", 1)[1]):
            if op != name:
                users[op].append(name)

    nbytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
              "s8": 1, "u8": 1, "pred": 1}

    def shape_bytes(s: str) -> int:
        m = re.match(r"(\w+)\[([\d,]*)\]", s)
        if not m:
            return 0
        n = 1
        for d in (m.group(2).split(",") if m.group(2) else []):
            n *= int(d)
        return n * nbytes.get(m.group(1), 4)

    rows = []
    for name, line in def_line.items():
        body = line.split("=", 1)[1]
        m = re.match(r"\s*\(?\s*(\w+\[[\d,]*\]\{[^}]*\})", body)
        if " copy(" not in body and " copy-start(" not in body:
            continue
        shape = m.group(1) if m else "?"
        ops = re.findall(r"%([\w.\-]+)", body)
        src = ops[0] if ops else "?"
        rows.append((shape_bytes(shape), name, shape, src))

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} copy ops, {total/1e6:.1f} MB total (per scan trip)")
    for b, name, shape, src in rows[:24]:
        srcline = def_line.get(src, "?")
        use = users.get(name, ["?"])[:2]
        uselines = [def_line.get(u, u)[:110] for u in use]
        print(f"\n== {name}: {shape} ({b/1e6:.2f} MB)")
        print(f"   src {src}: {srcline[:160]}")
        for u in uselines:
            print(f"   use: {u}")


if __name__ == "__main__":
    main()
