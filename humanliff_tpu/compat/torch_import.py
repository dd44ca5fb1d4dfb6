"""Import reference PyTorch checkpoints (.tar / .pt state dicts) into our params.

Enables A/B parity validation against trained reference weights (SURVEY.md §7 "hard
parts"): Stage-1 ``{step}.tar`` files carry ``network_fn_state_dict`` with the
decoder MLP + ``tri_planes`` (run_nerf_batch.py:321-330); Stage-2 ``model*.pt`` /
``ema_*.pt`` carry the UNet.

Key mappings (torch -> flax):
- Linear: ``weight (out, in)`` -> ``kernel (in, out)`` (transpose); bias unchanged.
- Conv2d: ``weight (out, in, kh, kw)`` -> ``kernel (kh, kw, in, out)``.
- Conv1d k=1 (attention qkv/proj): treated as Dense with transpose.
- GroupNorm: ``weight/bias`` -> ``scale/bias``.
- NHWC note: convs transpose cleanly because flax NHWC convs use HWIO kernels.

Decoder layer names: pts_linears.{0,1,2} -> trunk_{0,1,2}; feature_linear ->
feature; alpha_linear -> alpha; views_linear -> views; rgb_linear -> rgb
(lib/renderer.py:38-43).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _load_torch(path: str) -> Dict[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


def _np(t) -> np.ndarray:
    """Tensor-or-array -> fp32 numpy. The mapping layer below works on plain
    numpy state dicts, so it is testable (and usable) without torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _conv(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (out, in, kh, kw)
    return {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _conv1d_as_dense(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (out, in, 1)
    return {"kernel": w[:, :, 0].T, "bias": _np(sd[f"{prefix}.bias"])}


def _groupnorm(sd, prefix):
    return {
        "GroupNorm_0": {
            "scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    }


def import_stage1_checkpoint(path: str):
    """Reference Stage-1 .tar -> (params dict {planes, decoder}, global_step).

    Handles both the shared checkpoint (full state dict) and the fine-tune
    tri-plane-only artifact (run_nerf_batch_ft.py:323-333).
    """
    obj = _load_torch(path)
    step = int(obj.get("global_step", 0))
    sd = obj.get("network_fn_state_dict", obj)
    return stage1_params_from_state_dict(sd), step


def stage1_params_from_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference Stage-1 state dict (torch tensors OR numpy arrays,
    reference key names) onto our {planes, decoder} params."""
    # strip DataParallel 'module.' prefixes if present
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    planes = _np(sd["tri_planes"]) if "tri_planes" in sd else None

    decoder = None
    if "pts_linears.0.weight" in sd:
        decoder = {
            "params": {
                "trunk_0": _dense(sd, "pts_linears.0"),
                "trunk_1": _dense(sd, "pts_linears.1"),
                "trunk_2": _dense(sd, "pts_linears.2"),
                "feature": _dense(sd, "feature_linear"),
                "alpha": _dense(sd, "alpha_linear"),
                "views": _dense(sd, "views_linear"),
                "rgb": _dense(sd, "rgb_linear"),
            }
        }
    out = {}
    if planes is not None:
        out["planes"] = planes
    if decoder is not None:
        out["decoder"] = decoder
    return out


def _resblock(sd, p):
    out = {
        "in_norm": _groupnorm(sd, f"{p}.in_layers.0"),
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "out_norm": _groupnorm(sd, f"{p}.out_layers.0"),
        "out_conv": {"Conv_0": _conv(sd, f"{p}.out_layers.3")},
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip_conv"] = _conv(sd, f"{p}.skip_connection")
    return out


def _attn(sd, p):
    return {
        "GroupNorm32_0": _groupnorm(sd, f"{p}.norm"),
        "qkv": _conv1d_as_dense(sd, f"{p}.qkv"),
        "proj_out": {"Dense_0": _conv1d_as_dense(sd, f"{p}.proj_out")},
    }


def import_unet_checkpoint(
    path: str,
    num_res_blocks: int = 3,
    channel_mult=(1, 1, 2, 2, 4, 4),
    attention_ds=(8, 16, 32),
    cond_type: str = "controlnet",
):
    """Reference UNet .pt -> flax UNetModel variables.

    Walks the same construction order as unet.py:375-518 to map the flat
    ``input_blocks.N.M.*`` indices onto our named blocks.
    """
    sd = _load_torch(path)
    return unet_params_from_state_dict(
        sd,
        num_res_blocks=num_res_blocks,
        channel_mult=channel_mult,
        attention_ds=attention_ds,
        cond_type=cond_type,
    )


def unet_params_from_state_dict(
    sd: Dict[str, Any],
    num_res_blocks: int = 3,
    channel_mult=(1, 1, 2, 2, 4, 4),
    attention_ds=(8, 16, 32),
    cond_type: str = "controlnet",
):
    """Map a reference UNet state dict (torch tensors OR numpy arrays) onto
    our flax variables; torch-free numpy path used by the golden tests."""
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    params: Dict[str, Any] = {
        "time_mlp_1": _dense(sd, "time_embed.0"),
        "time_mlp_2": _dense(sd, "time_embed.2"),
        "out_norm": _groupnorm(sd, "out.0"),
        "out_conv": {"Conv_0": _conv(sd, "out.2")},
    }
    if "label_emb.weight" in sd:
        params["label_emb"] = {"embedding": _np(sd["label_emb.weight"])}

    def walk_encoder(torch_prefix: str, our_prefix: str, with_attn: bool):
        # Block 0: input conv (TimestepEmbedSequential with single conv).
        params[f"{our_prefix}in_conv"] = _conv(sd, f"{torch_prefix}.0.0")
        ds = 1
        idx = 1
        for level, _mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                params[f"{our_prefix}res_{idx}"] = _resblock(
                    sd, f"{torch_prefix}.{idx}.0"
                )
                if ds in attention_ds:
                    params[f"{our_prefix}attn_{idx}"] = _attn(
                        sd, f"{torch_prefix}.{idx}.1"
                    )
                idx += 1
            if level != len(channel_mult) - 1:
                params[f"{our_prefix}down_{idx}"] = {
                    "op": _conv(sd, f"{torch_prefix}.{idx}.0.op")
                }
                ds *= 2
                idx += 1
        return idx

    n_enc = walk_encoder("input_blocks", "enc_", False)

    params["mid_res1"] = _resblock(sd, "middle_block.0")
    params["mid_attn"] = _attn(sd, "middle_block.1")
    params["mid_res2"] = _resblock(sd, "middle_block.2")

    # Decoder: output_blocks.N is [res, (attn), (upsample)].
    ds = 2 ** (len(channel_mult) - 1)
    idx = 0
    for level, _mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            params[f"dec_res_{idx}"] = _resblock(sd, f"output_blocks.{idx}.0")
            pos = 1
            if ds in attention_ds:
                params[f"dec_attn_{idx}"] = _attn(sd, f"output_blocks.{idx}.{pos}")
                pos += 1
            if level and i == num_res_blocks:
                params[f"dec_up_{idx}"] = {
                    "conv": _conv(sd, f"output_blocks.{idx}.{pos}.conv")
                }
                ds //= 2
            idx += 1

    if cond_type == "controlnet" and "input_blocks_cond.0.0.weight" in sd:
        walk_encoder("input_blocks_cond", "cond_", True)
        # zero 1x1 projections, one per encoder block
        for i in range(n_enc):
            params[f"cond_proj_{i}"] = {
                "Conv_0": _conv(sd, f"input_blocks_proj_cond.{i}")
            }

    return {"params": params}
