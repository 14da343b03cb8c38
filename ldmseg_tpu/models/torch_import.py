"""Torch (diffusers) checkpoint ingestion.

Converts Stable-Diffusion v1-4 ``UNet2DConditionModel`` and
``AutoencoderKL`` torch state dicts into our Flax param trees with exact
numerics (SURVEY §7 "hard parts": SD weight ingestion). The reference
loads these via ``from_pretrained`` (tools/main_ldm.py:138-147); here we
read a LOCAL diffusers model directory (``diffusion_pytorch_model.bin`` /
``.safetensors`` under ``unet/`` and ``vae/``) — the environment is
zero-egress, so no hub downloads.

Conventions:
  * torch Conv2d ``[out, in, kh, kw]``  -> flax ``[kh, kw, in, out]``
  * torch Linear ``[out, in]``          -> flax ``[in, out]``
  * torch ConvTranspose2d ``[in, out, kh, kw]`` -> flax ``[kh, kw, in, out]``
  * norm ``weight/bias``                -> ``scale/bias``
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _load_state_dict(model_dir: str, subdir: str) -> Dict[str, np.ndarray]:
    base = os.path.join(model_dir, subdir)
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin"):
        path = os.path.join(base, name)
        if os.path.exists(path):
            if name.endswith(".safetensors"):
                from safetensors.numpy import load_file
                return load_file(path)
            import torch
            sd = torch.load(path, map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no diffusers weights under {base}")


def _conv(sd, name):
    return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{name}.bias"]}


def _conv_transpose(sd, name):
    """torch ConvTranspose2d -> flax ConvTranspose: besides the axis
    permutation the spatial taps must be FLIPPED (lax.conv_transpose
    correlates where torch convolves). Needed for the seg-VAE upscalers
    when importing reference stage-1 checkpoints."""
    w = sd[f"{name}.weight"]  # [in, out, kh, kw]
    return {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": sd[f"{name}.bias"]}


def _dense(sd, name, bias=True):
    out = {"kernel": sd[f"{name}.weight"].transpose(1, 0)}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet(sd, pfx, temb=True):
    out = {
        "norm1": _norm(sd, f"{pfx}.norm1"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "norm2": _norm(sd, f"{pfx}.norm2"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
    }
    if temb and f"{pfx}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _dense(sd, f"{pfx}.time_emb_proj")
    if f"{pfx}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{pfx}.conv_shortcut")
    return out


def _attention(sd, pfx):
    """diffusers Attention inside a BasicTransformerBlock."""
    return {
        "to_q": _dense(sd, f"{pfx}.to_q", bias=False),
        "to_k": _dense(sd, f"{pfx}.to_k", bias=False),
        "to_v": _dense(sd, f"{pfx}.to_v", bias=False),
        "to_out": _dense(sd, f"{pfx}.to_out.0"),
    }


def _transformer(sd, pfx, use_cross_attention=True, depth=1):
    out = {
        "norm": _norm(sd, f"{pfx}.norm"),
        "proj_in": _conv(sd, f"{pfx}.proj_in"),
        "proj_out": _conv(sd, f"{pfx}.proj_out"),
    }
    for i in range(depth):
        bp = f"{pfx}.transformer_blocks.{i}"
        blk = {
            "norm1": _norm(sd, f"{bp}.norm1"),
            "attn1": _attention(sd, f"{bp}.attn1"),
            "norm3": _norm(sd, f"{bp}.norm3"),
            "ff": {
                "proj_in": _dense(sd, f"{bp}.ff.net.0.proj"),
                "proj_out": _dense(sd, f"{bp}.ff.net.2"),
            },
        }
        if use_cross_attention:
            blk["norm2"] = _norm(sd, f"{bp}.norm2")
            blk["attn2"] = _attention(sd, f"{bp}.attn2")
        out[f"block{i}"] = blk
    return out


def load_diffusers_unet(model_dir: str, config) -> dict:
    """Build the ``UNet2DCondition`` param tree from ``<dir>/unet``.

    ``config``: our UNetConfig — controls whether attn2/norm2 are loaded
    (cross-attention removal drops them, reference unet.py:83-105).
    """
    return unet_params_from_sd(_load_state_dict(model_dir, "unet"), config)


def unet_params_from_sd(sd: Dict[str, np.ndarray], config) -> dict:
    """Convert an in-memory diffusers-UNet state dict (flat torch keys) to
    our param tree — shared by the hub-layout loader above and the
    reference stage-2 checkpoint importer (``load_reference_ldm``)."""
    xattn = config.use_cross_attention
    n_blocks = len(config.block_out_channels)
    lpb = config.layers_per_block

    params: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }

    for i in range(n_blocks):
        blk: dict = {}
        for j in range(lpb):
            blk[f"resnet{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if config.attn_down[i]:
                blk[f"attn{j}"] = _transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", xattn)
        if i < n_blocks - 1:
            blk["downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
        params[f"down_blocks{i}"] = blk

    params["mid_block"] = {
        "resnet0": _resnet(sd, "mid_block.resnets.0"),
        "attn": _transformer(sd, "mid_block.attentions.0", xattn),
        "resnet1": _resnet(sd, "mid_block.resnets.1"),
    }

    attn_up = tuple(reversed(config.attn_down))
    for i in range(n_blocks):
        blk = {}
        for j in range(lpb + 1):
            blk[f"resnet{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if attn_up[i]:
                blk[f"attn{j}"] = _transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", xattn)
        if i < n_blocks - 1:
            blk["upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
        params[f"up_blocks{i}"] = blk

    import jax.numpy as jnp
    params = _to_jnp(params)
    return {"params": params}


def _vae_attention(sd, pfx):
    """AutoencoderKL mid attention; handles both modern (to_q/...) and
    legacy (query/key/value/proj_attn) key names."""
    if f"{pfx}.to_q.weight" in sd:
        names = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                 "to_out": "to_out.0"}
    else:
        names = {"to_q": "query", "to_k": "key", "to_v": "value",
                 "to_out": "proj_attn"}
    return {
        "group_norm": _norm(sd, f"{pfx}.group_norm"),
        "to_q": _dense(sd, f"{pfx}.{names['to_q']}"),
        "to_k": _dense(sd, f"{pfx}.{names['to_k']}"),
        "to_v": _dense(sd, f"{pfx}.{names['to_v']}"),
        "to_out": _dense(sd, f"{pfx}.{names['to_out']}"),
    }


def load_diffusers_vae(model_dir: str, decoder_enabled: bool = True) -> dict:
    """Build the ``ImageVAE`` param tree from ``<dir>/vae``."""
    return image_vae_params_from_sd(_load_state_dict(model_dir, "vae"),
                                    decoder_enabled)


def image_vae_params_from_sd(sd: Dict[str, np.ndarray],
                             decoder_enabled: bool = True) -> dict:
    """Convert an in-memory AutoencoderKL state dict to our ImageVAE
    tree (shared with ``load_reference_ldm``)."""
    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in"),
                 "norm_out": _norm(sd, "encoder.conv_norm_out"),
                 "conv_out": _conv(sd, "encoder.conv_out")}
    for i in range(4):
        blk = {}
        for j in range(2):
            blk[f"resnet{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", temb=False)
        if i < 3:
            blk["downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc[f"down{i}"] = blk
    enc["mid_resnet0"] = _resnet(sd, "encoder.mid_block.resnets.0",
                                 temb=False)
    enc["mid_resnet1"] = _resnet(sd, "encoder.mid_block.resnets.1",
                                 temb=False)
    enc["mid_attn"] = _vae_attention(sd, "encoder.mid_block.attentions.0")

    params = {"encoder": enc, "quant_conv": _conv(sd, "quant_conv")}

    if decoder_enabled:
        dec: dict = {"conv_in": _conv(sd, "decoder.conv_in"),
                     "norm_out": _norm(sd, "decoder.conv_norm_out"),
                     "conv_out": _conv(sd, "decoder.conv_out")}
        for i in range(4):
            blk = {}
            for j in range(3):
                blk[f"resnet{j}"] = _resnet(
                    sd, f"decoder.up_blocks.{i}.resnets.{j}", temb=False)
            if i < 3:
                blk["upsample"] = _conv(
                    sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            dec[f"up{i}"] = blk
        dec["mid_resnet0"] = _resnet(sd, "decoder.mid_block.resnets.0",
                                     temb=False)
        dec["mid_resnet1"] = _resnet(sd, "decoder.mid_block.resnets.1",
                                     temb=False)
        dec["mid_attn"] = _vae_attention(sd,
                                         "decoder.mid_block.attentions.0")
        params["decoder"] = dec
        params["post_quant_conv"] = _conv(sd, "post_quant_conv")

    return {"params": _to_jnp(params)}


def _to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(np.asarray(tree, dtype=np.float32))


# ---------------------------------------------------------------------------
# Reference stage-1 VAE checkpoints (torch GeneralVAESeg state dicts)
# ---------------------------------------------------------------------------

def seg_vae_key_map(
    block_out_channels=(32, 64, 128, 256),
    num_upscalers: int = 1,
    num_mid_blocks: int = 0,
) -> dict:
    """Map reference ``GeneralVAESeg`` Sequential-index keys
    (``encoder.<i>`` / ``decoder.<i>``, vae.py:124-245) to our named
    modules. Only the default (non-mid-block) topology is indexed; mid
    resnets would need the diffusers block map."""
    assert num_mid_blocks == 0, "mid-block import not implemented"
    m: dict = {"encoder.0": ("encoder", "in_conv", "conv")}
    idx = 2
    for i in range(len(block_out_channels) - 1):
        m[f"encoder.{idx}"] = ("encoder", f"down{i}_conv1", "conv")
        m[f"encoder.{idx + 1}"] = ("encoder", f"down{i}_conv2", "conv")
        idx += 3  # conv, conv, SiLU
    m[f"encoder.{idx}"] = ("encoder", "out_conv1", "conv")
    idx += 2  # conv + Identity(mid)
    m[f"encoder.{idx}"] = ("encoder", "norm", "norm")
    m[f"encoder.{idx + 2}"] = ("encoder", "out_conv2", "conv")

    m["decoder.0"] = ("decoder", "in_conv", "conv")
    idx = 2  # conv_in + Identity(mid)
    for i in range(num_upscalers):
        m[f"decoder.{idx}"] = ("decoder", f"up{i}_convt", "convt")
        m[f"decoder.{idx + 1}"] = ("decoder", f"up{i}_ln", "ln2d")
        idx += 3  # convT, LayerNorm2d, SiLU
    m[f"decoder.{idx}"] = ("decoder", "norm", "norm")
    m[f"decoder.{idx + 2}"] = ("decoder", "out_conv", "conv")
    return m


def load_reference_seg_vae(
    path: str,
    block_out_channels=(32, 64, 128, 256),
    num_upscalers: int = 1,
    state_key: str = "vae",
) -> dict:
    """Convert a reference stage-1 checkpoint (``torch.save({'vae': ...})``,
    trainers_ae.py:534-548; 'module.' DDP prefixes stripped like
    vae.py:117-122) into our SegVAE param tree."""
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data[state_key] if isinstance(data, dict) and state_key in data \
        else data
    sd = {k.replace("module.", ""): v.numpy() for k, v in sd.items()}
    return seg_vae_params_from_sd(sd, block_out_channels, num_upscalers)


def seg_vae_params_from_sd(
    sd: Dict[str, np.ndarray],
    block_out_channels=(32, 64, 128, 256),
    num_upscalers: int = 1,
) -> dict:
    """Convert an in-memory ``GeneralVAESeg`` state dict (Sequential-index
    keys, 'module.' prefixes already stripped) to our SegVAE tree."""
    keymap = seg_vae_key_map(block_out_channels, num_upscalers)
    params: dict = {"encoder": {}, "decoder": {}}
    for src, (group, name, kind) in keymap.items():
        w = sd[f"{src}.weight"]
        b = sd[f"{src}.bias"]
        if kind == "conv":
            leaf = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
        elif kind == "convt":
            leaf = {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
                    "bias": b}
        elif kind == "norm":
            leaf = {"scale": w, "bias": b}
        elif kind == "ln2d":
            leaf = {"ln": {"scale": w, "bias": b}}
        else:
            raise ValueError(kind)
        params[group][name] = leaf
    return {"params": _to_jnp(params)}


# ---------------------------------------------------------------------------
# Reference stage-2 (LDM) checkpoints
# ---------------------------------------------------------------------------

def load_reference_ldm(
    path: str,
    unet_config,
    block_out_channels=(32, 64, 128, 256),
    num_upscalers: int = 1,
    image_vae_decoder: bool = False,
) -> dict:
    """Ingest the fork's full stage-2 save dict
    ``{step, epoch, vae_image, vae_semseg, unet, ema?, opt?, p?, scaler?}``
    (reference construct_save_dict, trainers_ldm_cond.py:1844-1877;
    consumed by resume/load :1879-1943) so a reference LDM training run
    can be warm-started or evaluated here.

    Returns ``{"unet", "vae_image", "vae_semseg", "ema" (or None),
    "step"}`` — flax param trees ready for
    ``TrainerDiffusion.init_state(unet_params=..., ...)``.

    * 'module.' DDP prefixes are stripped from every sub-dict.
    * ``unet`` is the post-surgery diffusers state dict: conv_in already
      8(+cond)-ch, attn2/norm2 keys absent when cross-attention was
      removed (reference unet.py:83-105) — ``unet_config`` must describe
      the same surgery.
    * ``ema``: diffusers-EMAModel layout ``{shadow_params: [tensors...]}``
      ordered like ``unet.parameters()``; mapped back onto the unet tree
      by zipping with the unet state-dict key order (the SD UNet has no
      non-parameter buffers, so the orders coincide).
    """
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)

    def strip(sd):
        return {k.replace("module.", ""): np.asarray(v)
                for k, v in sd.items()}

    unet_sd = strip(data["unet"])
    out = {
        "unet": unet_params_from_sd(unet_sd, unet_config),
        "vae_image": image_vae_params_from_sd(
            strip(data["vae_image"]), decoder_enabled=image_vae_decoder),
        "vae_semseg": seg_vae_params_from_sd(
            strip(data["vae_semseg"]), block_out_channels, num_upscalers),
        "ema": None,
        "step": int(data.get("step") or 0),
    }

    ema = data.get("ema")
    if ema:
        shadows = ema.get("shadow_params", ema)
        if isinstance(shadows, dict):  # named variant: a plain state dict
            ema_sd = strip(shadows)
        else:
            ema_sd = {k: np.asarray(v)
                      for k, v in zip(unet_sd.keys(), shadows)}
        out["ema"] = unet_params_from_sd(ema_sd, unet_config)
    return out
