"""Text encoders for open-vocabulary detection (DK-DETR).

Rebuilds ``opera/models/utils/text_encoder.py:91,120``:
``PseudoTextEncoder`` serves precomputed class-text embeddings from disk;
``CLIPTextEncoder`` embeds prompt-templated class names with a HuggingFace
CLIP text tower (gated: requires locally available weights — this
environment has no network egress).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class PseudoTextEncoder:
    """Loads precomputed (num_classes, text_dim) embeddings (.npy)."""

    def __init__(self, text_feat_path: str = "", text_dim: int = 512):
        self.text_dim = text_dim
        self.text_feat_path = text_feat_path
        self._feats = None

    def get_text_feat(self):
        if self._feats is None:
            self._feats = np.load(self.text_feat_path).astype(np.float32)
            assert self._feats.shape[-1] == self.text_dim
        return self._feats


class CLIPTextEncoder:
    """Prompt-templated CLIP text embeddings via HF transformers."""

    TEMPLATES = ("a photo of a {}.",)

    def __init__(self, class_names: Sequence[str],
                 model_name: str = "openai/clip-vit-base-patch32",
                 text_dim: int = 512,
                 templates: Optional[Sequence[str]] = None):
        self.class_names = list(class_names)
        self.model_name = model_name
        self.text_dim = text_dim
        self.templates = list(templates or self.TEMPLATES)
        self._feats = None

    def get_text_feat(self):
        if self._feats is not None:
            return self._feats
        try:
            from transformers import CLIPTextModelWithProjection, \
                CLIPTokenizer
            import torch
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "transformers/torch required for CLIPTextEncoder") from e
        tok = CLIPTokenizer.from_pretrained(self.model_name)
        model = CLIPTextModelWithProjection.from_pretrained(self.model_name)
        model.eval()
        feats = []
        with torch.no_grad():
            for name in self.class_names:
                prompts = [t.format(name) for t in self.templates]
                inputs = tok(prompts, padding=True, return_tensors="pt")
                emb = model(**inputs).text_embeds
                emb = emb / emb.norm(dim=-1, keepdim=True)
                feats.append(emb.mean(0).numpy())
        self._feats = np.stack(feats).astype(np.float32)
        return self._feats
