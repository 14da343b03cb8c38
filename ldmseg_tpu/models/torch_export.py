"""Torch (reference-format) checkpoint EXPORT — the inverse of
``torch_import``.

Lets a model trained here be consumed by the reference stack (or by any
diffusers-based tooling): ``export_reference_ldm`` writes the fork's full
stage-2 save dict ``{step, epoch, vae_image, vae_semseg, unet, ema?}``
(reference ``construct_save_dict``, trainers_ldm_cond.py:1844-1877) and
``seg_vae_sd_from_params`` the stage-1 ``{'vae': ...}`` dict
(trainers_ae.py:534-548). Round-trip guaranteed by
tests/test_torch_export.py: ``load_reference_ldm(export(...))``
reproduces the source trees exactly.

Leaf conventions (inverse of torch_import):
  * flax conv   ``[kh, kw, in, out]``  -> torch Conv2d ``[out, in, kh, kw]``
  * flax dense  ``[in, out]``          -> torch Linear ``[out, in]``
  * flax convT  ``[kh, kw, in, out]``  -> flip taps, then
    torch ConvTranspose2d ``[in, out, kh, kw]``
  * ``scale``/``bias``                 -> norm ``weight``/``bias``
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _np(leaf) -> np.ndarray:
    if isinstance(leaf, dict):
        raise ValueError(
            "prequantized {'q','scale'} leaf — export the bf16/f32 tree "
            "(prequantize_conv_tree output cannot round-trip to torch)")
    return np.asarray(leaf, dtype=np.float32)


def _inv_conv(sd, name, leaf):
    sd[f"{name}.weight"] = _np(leaf["kernel"]).transpose(3, 2, 0, 1)
    sd[f"{name}.bias"] = _np(leaf["bias"])


def _inv_conv_transpose(sd, name, leaf):
    k = _np(leaf["kernel"])[::-1, ::-1]  # undo the correlation flip
    sd[f"{name}.weight"] = k.transpose(2, 3, 0, 1)
    sd[f"{name}.bias"] = _np(leaf["bias"])


def _inv_dense(sd, name, leaf, bias=True):
    sd[f"{name}.weight"] = _np(leaf["kernel"]).transpose(1, 0)
    if bias:
        sd[f"{name}.bias"] = _np(leaf["bias"])


def _inv_norm(sd, name, leaf):
    sd[f"{name}.weight"] = _np(leaf["scale"])
    sd[f"{name}.bias"] = _np(leaf["bias"])


def _inv_resnet(sd, pfx, node, temb=True):
    _inv_norm(sd, f"{pfx}.norm1", node["norm1"])
    _inv_conv(sd, f"{pfx}.conv1", node["conv1"])
    _inv_norm(sd, f"{pfx}.norm2", node["norm2"])
    _inv_conv(sd, f"{pfx}.conv2", node["conv2"])
    if temb and "time_emb_proj" in node:
        _inv_dense(sd, f"{pfx}.time_emb_proj", node["time_emb_proj"])
    if "conv_shortcut" in node:
        _inv_conv(sd, f"{pfx}.conv_shortcut", node["conv_shortcut"])


def _inv_attention(sd, pfx, node):
    _inv_dense(sd, f"{pfx}.to_q", node["to_q"], bias=False)
    _inv_dense(sd, f"{pfx}.to_k", node["to_k"], bias=False)
    _inv_dense(sd, f"{pfx}.to_v", node["to_v"], bias=False)
    _inv_dense(sd, f"{pfx}.to_out.0", node["to_out"])


def _inv_transformer(sd, pfx, node, use_cross_attention=True, depth=1):
    _inv_norm(sd, f"{pfx}.norm", node["norm"])
    _inv_conv(sd, f"{pfx}.proj_in", node["proj_in"])
    _inv_conv(sd, f"{pfx}.proj_out", node["proj_out"])
    for i in range(depth):
        bp = f"{pfx}.transformer_blocks.{i}"
        blk = node[f"block{i}"]
        _inv_norm(sd, f"{bp}.norm1", blk["norm1"])
        _inv_attention(sd, f"{bp}.attn1", blk["attn1"])
        _inv_norm(sd, f"{bp}.norm3", blk["norm3"])
        _inv_dense(sd, f"{bp}.ff.net.0.proj", blk["ff"]["proj_in"])
        _inv_dense(sd, f"{bp}.ff.net.2", blk["ff"]["proj_out"])
        if use_cross_attention:
            _inv_norm(sd, f"{bp}.norm2", blk["norm2"])
            _inv_attention(sd, f"{bp}.attn2", blk["attn2"])


def unet_sd_from_params(params: dict, config) -> Dict[str, np.ndarray]:
    """Our ``UNet2DCondition`` tree -> diffusers-UNet flat state dict
    (post-surgery: conv_in at its expanded width, attn2/norm2 omitted
    when cross-attention is removed) — the exact inverse of
    ``torch_import.unet_params_from_sd``."""
    p = params.get("params", params)
    xattn = config.use_cross_attention
    n_blocks = len(config.block_out_channels)
    lpb = config.layers_per_block

    sd: Dict[str, np.ndarray] = {}
    _inv_conv(sd, "conv_in", p["conv_in"])
    _inv_dense(sd, "time_embedding.linear_1",
               p["time_embedding"]["linear_1"])
    _inv_dense(sd, "time_embedding.linear_2",
               p["time_embedding"]["linear_2"])
    _inv_norm(sd, "conv_norm_out", p["conv_norm_out"])
    _inv_conv(sd, "conv_out", p["conv_out"])

    for i in range(n_blocks):
        blk = p[f"down_blocks{i}"]
        for j in range(lpb):
            _inv_resnet(sd, f"down_blocks.{i}.resnets.{j}",
                        blk[f"resnet{j}"])
            if config.attn_down[i]:
                _inv_transformer(sd, f"down_blocks.{i}.attentions.{j}",
                                 blk[f"attn{j}"], xattn)
        if i < n_blocks - 1:
            _inv_conv(sd, f"down_blocks.{i}.downsamplers.0.conv",
                      blk["downsample"]["conv"])

    mid = p["mid_block"]
    _inv_resnet(sd, "mid_block.resnets.0", mid["resnet0"])
    _inv_transformer(sd, "mid_block.attentions.0", mid["attn"], xattn)
    _inv_resnet(sd, "mid_block.resnets.1", mid["resnet1"])

    attn_up = tuple(reversed(config.attn_down))
    for i in range(n_blocks):
        blk = p[f"up_blocks{i}"]
        for j in range(lpb + 1):
            _inv_resnet(sd, f"up_blocks.{i}.resnets.{j}",
                        blk[f"resnet{j}"])
            if attn_up[i]:
                _inv_transformer(sd, f"up_blocks.{i}.attentions.{j}",
                                 blk[f"attn{j}"], xattn)
        if i < n_blocks - 1:
            _inv_conv(sd, f"up_blocks.{i}.upsamplers.0.conv",
                      blk["upsample"]["conv"])
    return sd


def image_vae_sd_from_params(params: dict,
                             decoder_enabled: bool = True
                             ) -> Dict[str, np.ndarray]:
    """Our ``ImageVAE`` tree -> AutoencoderKL flat state dict (modern
    to_q/to_out.0 attention key names)."""
    p = params.get("params", params)
    enc = p["encoder"]
    sd: Dict[str, np.ndarray] = {}
    _inv_conv(sd, "encoder.conv_in", enc["conv_in"])
    _inv_norm(sd, "encoder.conv_norm_out", enc["norm_out"])
    _inv_conv(sd, "encoder.conv_out", enc["conv_out"])
    for i in range(4):
        blk = enc[f"down{i}"]
        for j in range(2):
            _inv_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}",
                        blk[f"resnet{j}"], temb=False)
        if i < 3:
            _inv_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      blk["downsample"])
    _inv_resnet(sd, "encoder.mid_block.resnets.0", enc["mid_resnet0"],
                temb=False)
    _inv_resnet(sd, "encoder.mid_block.resnets.1", enc["mid_resnet1"],
                temb=False)
    at = enc["mid_attn"]
    _inv_norm(sd, "encoder.mid_block.attentions.0.group_norm",
              at["group_norm"])
    for ours, theirs in (("to_q", "to_q"), ("to_k", "to_k"),
                         ("to_v", "to_v"), ("to_out", "to_out.0")):
        _inv_dense(sd, f"encoder.mid_block.attentions.0.{theirs}",
                   at[ours])
    _inv_conv(sd, "quant_conv", p["quant_conv"])

    if decoder_enabled and "decoder" in p:
        dec = p["decoder"]
        _inv_conv(sd, "decoder.conv_in", dec["conv_in"])
        _inv_norm(sd, "decoder.conv_norm_out", dec["norm_out"])
        _inv_conv(sd, "decoder.conv_out", dec["conv_out"])
        for i in range(4):
            blk = dec[f"up{i}"]
            for j in range(3):
                _inv_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}",
                            blk[f"resnet{j}"], temb=False)
            if i < 3:
                _inv_conv(sd,
                          f"decoder.up_blocks.{i}.upsamplers.0.conv",
                          blk["upsample"])
        _inv_resnet(sd, "decoder.mid_block.resnets.0",
                    dec["mid_resnet0"], temb=False)
        _inv_resnet(sd, "decoder.mid_block.resnets.1",
                    dec["mid_resnet1"], temb=False)
        at = dec["mid_attn"]
        _inv_norm(sd, "decoder.mid_block.attentions.0.group_norm",
                  at["group_norm"])
        for ours, theirs in (("to_q", "to_q"), ("to_k", "to_k"),
                             ("to_v", "to_v"), ("to_out", "to_out.0")):
            _inv_dense(sd, f"decoder.mid_block.attentions.0.{theirs}",
                       at[ours])
        _inv_conv(sd, "post_quant_conv", p["post_quant_conv"])
    return sd


def seg_vae_sd_from_params(params: dict,
                           block_out_channels=(32, 64, 128, 256),
                           num_upscalers: int = 1
                           ) -> Dict[str, np.ndarray]:
    """Our ``SegVAE`` tree -> reference ``GeneralVAESeg`` Sequential-index
    state dict, by inverting ``torch_import.seg_vae_key_map``."""
    from .torch_import import seg_vae_key_map
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    for dst, (group, name, kind) in seg_vae_key_map(
            block_out_channels, num_upscalers).items():
        leaf = p[group][name]
        if kind == "conv":
            _inv_conv(sd, dst, leaf)
        elif kind == "convt":
            _inv_conv_transpose(sd, dst, leaf)
        elif kind == "norm":
            _inv_norm(sd, dst, leaf)
        elif kind == "ln2d":
            _inv_norm(sd, dst, leaf["ln"])
        else:  # pragma: no cover - keymap kinds are closed
            raise ValueError(kind)
    return sd


def export_reference_ldm(
    path: str,
    unet_params: dict,
    vae_image_params: dict,
    vae_semseg_params: dict,
    unet_config,
    block_out_channels=(32, 64, 128, 256),
    num_upscalers: int = 1,
    image_vae_decoder: bool = False,
    ema_params: Optional[dict] = None,
    step: int = 0,
    epoch: int = 0,
) -> None:
    """Write the fork's stage-2 save dict (torch-loadable) from our param
    trees — the inverse of ``torch_import.load_reference_ldm``. ``ema``
    is stored in the diffusers-EMAModel layout (``shadow_params`` list
    ordered like the unet state dict, matching the importer)."""
    import torch

    def t(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v).copy())
                for k, v in sd.items()}

    unet_sd = unet_sd_from_params(unet_params, unet_config)
    payload = {
        "step": step,
        "epoch": epoch,
        "unet": t(unet_sd),
        "vae_image": t(image_vae_sd_from_params(
            vae_image_params, decoder_enabled=image_vae_decoder)),
        "vae_semseg": t(seg_vae_sd_from_params(
            vae_semseg_params, block_out_channels, num_upscalers)),
    }
    if ema_params is not None:
        ema_sd = unet_sd_from_params(ema_params, unet_config)
        payload["ema"] = {"shadow_params": [
            torch.from_numpy(np.ascontiguousarray(ema_sd[k]))
            for k in unet_sd]}
    torch.save(payload, path)
