"""Text encoders for open-vocabulary detection (DK-DETR).

Rebuilds ``opera/models/utils/text_encoder.py:91,120``:
``PseudoTextEncoder`` serves precomputed class-text embeddings from disk;
``CLIPTextEncoder`` embeds prompt-templated class names with a HuggingFace
CLIP text tower.  The prompt assembly and prompt-ensembling math are pure
functions (unit-testable offline); only the embedding call touches HF
weights (gated: this environment has no network egress) and is injectable.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

# ViLD prompt ensemble (reference ``text_encoder.py:13-78``
# ``vild_templates`` — the default for CLIPTextEncoder)
VILD_TEMPLATES = (
    'There is a {} in the scene.',
    'There is the {} in the scene.',
    'a photo of a {} in the scene.',
    'a photo of the {} in the scene.',
    'a photo of one {} in the scene.',
    'itap of a {}.',
    'itap of my {}.',
    'itap of the {}.',
    'a photo of a {}.',
    'a photo of my {}.',
    'a photo of the {}.',
    'a photo of one {}.',
    'a photo of many {}.',
    'a good photo of a {}.',
    'a good photo of the {}.',
    'a bad photo of a {}.',
    'a bad photo of the {}.',
    'a photo of a nice {}.',
    'a photo of the nice {}.',
    'a photo of a cool {}.',
    'a photo of the cool {}.',
    'a photo of a weird {}.',
    'a photo of the weird {}.',
    'a photo of a small {}.',
    'a photo of the small {}.',
    'a photo of a large {}.',
    'a photo of the large {}.',
    'a photo of a clean {}.',
    'a photo of the clean {}.',
    'a photo of a dirty {}.',
    'a photo of the dirty {}.',
    'a bright photo of a {}.',
    'a bright photo of the {}.',
    'a dark photo of a {}.',
    'a dark photo of the {}.',
    'a photo of a hard to see {}.',
    'a photo of the hard to see {}.',
    'a low resolution photo of a {}.',
    'a low resolution photo of the {}.',
    'a cropped photo of a {}.',
    'a cropped photo of the {}.',
    'a close-up photo of a {}.',
    'a close-up photo of the {}.',
    'a jpeg corrupted photo of a {}.',
    'a jpeg corrupted photo of the {}.',
    'a blurry photo of a {}.',
    'a blurry photo of the {}.',
    'a pixelated photo of a {}.',
    'a pixelated photo of the {}.',
    'a black and white photo of the {}.',
    'a black and white photo of a {}.',
    'a plastic {}.',
    'the plastic {}.',
    'a toy {}.',
    'the toy {}.',
    'a plushie {}.',
    'the plushie {}.',
    'a cartoon {}.',
    'the cartoon {}.',
    'an embroidered {}.',
    'the embroidered {}.',
    'a painting of the {}.',
    'a painting of a {}.',
)


def build_prompts(class_names: Sequence[str],
                  templates: Sequence[str]) -> list:
    """Prompt-major flattened prompt list (reference
    ``text_encoder.py:147-150``: ``[[p.format(n) for n in names] for p in
    prompts]`` flattened) — index = prompt_idx * num_classes + class_idx.
    """
    return [t.format(name) for t in templates for name in class_names]


def ensemble_prompt_embeddings(embeddings: np.ndarray, num_templates: int,
                               num_classes: int) -> np.ndarray:
    """(num_templates * num_classes, D) prompt-major embeddings ->
    (num_classes, D) class features: mean over the template axis
    (reference ``get_text_feat``, ``text_encoder.py:176-179`` —
    ``reshape(num_prompt, -1, D).mean(0)``; the raw projection outputs are
    averaged UN-normalized, cosine normalization happens in the DK-DETR
    head)."""
    embeddings = np.asarray(embeddings, np.float32)
    assert embeddings.shape[0] == num_templates * num_classes, (
        embeddings.shape, num_templates, num_classes)
    return embeddings.reshape(
        num_templates, num_classes, -1).mean(0)


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


def _hf_clip_embed(prompts: Sequence[str], model_name: str) -> np.ndarray:
    """The only HF touchpoint: prompts -> (len(prompts), D) raw projection
    outputs (reference ``CLIPTextEncoder.forward``)."""
    try:
        from transformers import CLIPTextModelWithProjection, CLIPTokenizer
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "transformers/torch required for CLIPTextEncoder") from e
    tok = CLIPTokenizer.from_pretrained(model_name)
    model = CLIPTextModelWithProjection.from_pretrained(model_name)
    model.eval()
    with torch.no_grad():
        inputs = tok(list(prompts), padding=True, truncation=True,
                     return_tensors="pt")
        emb = model(**inputs).text_embeds
    return emb.numpy()


class CLIPTextEncoder:
    """Prompt-templated CLIP text embeddings.

    ``embed_fn(prompts) -> (P, D)`` is injectable so the templating /
    ensembling math is testable without HF weights (this environment has
    no egress); the default calls the HuggingFace CLIP text tower.
    """

    def __init__(self, class_names: Sequence[str],
                 model_name: str = "openai/clip-vit-base-patch32",
                 text_dim: int = 512,
                 templates: Optional[Sequence[str]] = None,
                 embed_fn: Optional[Callable] = None):
        self.class_names = list(class_names)
        self.model_name = model_name
        self.text_dim = text_dim
        self.templates = list(templates or VILD_TEMPLATES)
        self.embed_fn = embed_fn or (
            lambda prompts: _hf_clip_embed(prompts, self.model_name))
        self._feats = None

    def get_text_feat(self):
        if self._feats is None:
            prompts = build_prompts(self.class_names, self.templates)
            emb = np.asarray(self.embed_fn(prompts), np.float32)
            self._feats = ensemble_prompt_embeddings(
                emb, len(self.templates), len(self.class_names))
            assert self._feats.shape == (len(self.class_names),
                                         emb.shape[-1])
        return self._feats
