"""Training CLI.

Parity: reference `tts/train.py:11-32`:
    python -m isp_tts_tpu.train --config-root recipes --config-name <yaml>
Extra: ``--set section.key=value`` overrides, ``--compute-stats``.
"""

from __future__ import annotations

import argparse
import logging


def parse_overrides(pairs: list[str]) -> dict:
    """``--set a.b.c=<yaml>`` — values parse as YAML (flow mappings/lists,
    scalars); unparseable values stay raw strings. Interpolations like
    ``${model.encoder}`` survive as strings and resolve with the recipe."""
    import yaml

    root: dict = {}
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        try:
            value = yaml.safe_load(raw)
        except yaml.YAMLError:
            value = raw
        node = root
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def main(argv=None):
    parser = argparse.ArgumentParser(description="isp_tts_tpu trainer")
    parser.add_argument("--config-root", default="recipes")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="KEY=VALUE", help="config overrides (dot paths)")
    parser.add_argument("--compute-stats", action="store_true",
                        help="compute dataset pitch/energy stats and exit")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() "
                             "(TPU pods auto-detect the topology)")
    args = parser.parse_args(argv)

    if args.distributed:
        from .parallel.mesh import init_distributed

        init_distributed()

    # rank-0 logging discipline (reference console_logger.py:7-24: handlers
    # empty on non-main processes)
    import jax

    main = jax.process_index() == 0
    logging.basicConfig(
        level=logging.INFO if main else logging.WARNING,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    )

    from .training.experiment import ExperimentModules

    modules = ExperimentModules(args.config_name, args.config_root,
                                overrides=parse_overrides(args.overrides))

    if args.compute_stats:
        dataset = modules.build_dataset("train")
        stats = dataset.compute_stats(save_stats=True)
        print(stats.to_dict())
        return

    modules.init_modules()
    trainer = modules.build_trainer()
    trainer.train()


if __name__ == "__main__":
    main()
