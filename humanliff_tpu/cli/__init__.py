"""Command-line entry points mirroring the reference's scripts:

recon-train (run_nerf_batch.py), recon-ft (run_nerf_batch_ft.py),
recon-test (all_test.py), diff-train (image_train.py),
diff-sample (triplane_sample[_layered].py), image-nll (image_nll.py).
"""
