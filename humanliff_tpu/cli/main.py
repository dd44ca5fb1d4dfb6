"""Unified CLI dispatcher: ``humanliff <command> [...]``."""

from __future__ import annotations

import sys

COMMANDS = {
    "recon-train": "humanliff_tpu.cli.recon_train",
    "recon-ft": "humanliff_tpu.cli.recon_ft",
    "recon-test": "humanliff_tpu.cli.recon_test",
    "diff-train": "humanliff_tpu.cli.diff_train",
    "diff-sample": "humanliff_tpu.cli.diff_sample",
    "image-nll": "humanliff_tpu.cli.image_nll",
    "image-sample": "humanliff_tpu.cli.image_sample",
    "sr-train": "humanliff_tpu.cli.sr_train",
    "sr-sample": "humanliff_tpu.cli.sr_sample",
    "quality-eval": "humanliff_tpu.cli.quality_eval",
    "quality-stage2": "humanliff_tpu.cli.quality_stage2",
    "bench-decode": "humanliff_tpu.cli.bench_decode",
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print("usage: humanliff <command> [args]\ncommands:")
        for c in COMMANDS:
            print(f"  {c}")
        return 0 if argv and argv[0] in ("-h", "--help") else 1
    import importlib

    mod = importlib.import_module(COMMANDS[argv[0]])
    return mod.main(argv[1:])


if __name__ == "__main__":
    sys.exit(main())
