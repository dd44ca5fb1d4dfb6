"""recon_train CLI smoke test at tiny dims (CPU mesh).

Drives ``cli/recon_train.main`` end-to-end (reference:
recon_NeRF/run_nerf_batch.py) — the library train loop is covered by
test_e2e_pipeline; this covers the CLI wiring: config/flag parsing, loader,
checkpoint saves, and the compact decoder sidecars that make a pruned
checkpoint recoverable (cli/recon_refit --refit_steps 0).
"""

import glob
import os

import numpy as np
import jax

from humanliff_tpu.cli import recon_train
from humanliff_tpu.train import checkpoint as ckpt


def test_recon_train_cli_sidecars(tmp_path):
    out = str(tmp_path)
    recon_train.main([
        "--data_set_type", "synthetic",
        "--basedir", out, "--expname", "train",
        # The plane table is instance-sharded: instances must divide the
        # 8-device CPU test mesh (recon_refit sizes its own mesh instead).
        "--num_instance", "8",
        "--synthetic_image_size", "24",
        "--synthetic_tight_bounds", "true",
        "--n_rand", "64", "--batch_size", "8",
        "--n_samples", "8", "--n_importance", "8",
        "--triplane_dim", "16", "--triplane_ch", "9",
        "--n_iteration", "2",
        "--i_print", "2", "--i_weights", "2",
        "--seed", "0",
    ])
    expdir = os.path.join(out, "train")
    restored, step = ckpt.restore_state(expdir)
    assert step == 2
    sidecars = sorted(glob.glob(os.path.join(expdir, "decoder_*.npz")))
    assert sidecars, "every save must emit a decoder sidecar"
    dec = ckpt.load_decoder_npz(sidecars[-1])
    ref = ckpt.get_field(restored, "params")["decoder"]
    for a, b in zip(jax.tree.leaves(dec), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
