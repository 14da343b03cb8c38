"""Conditioning descriptors — pluggable image/text conditioning.

Reference: ldmseg/models/descriptors.py:67-105
(``get_image_descriptor_model``): options are CLIP vision features, CLIP
text (+tokenizer), learnable object queries, 'remove' (strip cross
attention entirely — the default, tools/configs/base/base.yaml:71), or
none.

TPU build: 'remove' and 'learnable' map to UNetConfig flags
(``use_cross_attention=False`` / ``num_object_queries``); CLIP paths use
HuggingFace Flax CLIP when local weights are available (zero-egress
environment: never downloads).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional


@dataclasses.dataclass
class DescriptorSpec:
    """Resolved conditioning option, consumed by the LDM trainer/config."""

    kind: str  # 'remove' | 'none' | 'learnable' | 'clip_vision' | 'clip_text'
    use_cross_attention: bool
    num_object_queries: int = 0
    encoder_hid_dim: int = 0
    model: Optional[Any] = None
    tokenizer: Optional[Any] = None


def get_image_descriptors(
    name: str = "remove",
    pretrained_path: Optional[str] = None,
    num_queries: int = 77,
    hidden_dim: int = 768,
) -> DescriptorSpec:
    """Resolve a conditioning mode (descriptors.py:67-105).

    * 'remove'    -> no cross attention at all (:94-96)
    * 'none'      -> keep cross attention, caller supplies embeddings
    * 'learnable' -> learnable object queries inside the UNet (:97-99;
                     unet.py:38-40)
    * 'clip' / 'clipproj' -> frozen Flax CLIP vision tower (:82-93)
    * 'text'      -> CLIP text encoder + tokenizer (:70-80)
    """
    if name == "remove":
        return DescriptorSpec(kind="remove", use_cross_attention=False)
    if name in (None, "none"):
        return DescriptorSpec(kind="none", use_cross_attention=True)
    if name == "learnable":
        return DescriptorSpec(kind="learnable", use_cross_attention=True,
                              num_object_queries=num_queries)
    if name in ("clip", "clipproj"):
        if pretrained_path is None:
            raise ValueError(
                "CLIP descriptors need local pretrained weights "
                "(zero-egress environment; pass pretrained_path)")
        from transformers import FlaxCLIPVisionModel
        model = FlaxCLIPVisionModel.from_pretrained(pretrained_path)
        return DescriptorSpec(kind="clip_vision", use_cross_attention=True,
                              encoder_hid_dim=hidden_dim, model=model)
    if name == "text":
        if pretrained_path is None:
            raise ValueError(
                "text descriptors need local pretrained weights "
                "(zero-egress environment; pass pretrained_path)")
        from transformers import CLIPTokenizer, FlaxCLIPTextModel
        tok = CLIPTokenizer.from_pretrained(pretrained_path)
        model = FlaxCLIPTextModel.from_pretrained(pretrained_path)
        return DescriptorSpec(kind="clip_text", use_cross_attention=True,
                              model=model, tokenizer=tok)
    raise NotImplementedError(f"descriptor {name!r}")
