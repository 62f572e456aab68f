"""T5 embedder: captions -> (B, 120, 2048) features + masks.

(ref language/t5.py T5Embedder.get_text_embeddings:58-79: clean twice,
tokenize max_length=120 with padding, encoder forward, return embeddings and
attention mask.) Tokenization needs the sentencepiece assets from a local
flan-t5-xl checkout (ref README.md:105-111); the encoder runs as the
controlar_tpu JAX T5.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from controlar_tpu.models.t5 import T5Config, T5_XL, t5_encode
from controlar_tpu.text.cleaning import text_preprocess


class T5Embedder:
    def __init__(
        self,
        params,
        tokenizer_path: str,
        cfg: T5Config = T5_XL,
        model_max_length: int = 120,
        use_text_preprocessing: bool = True,
    ):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            tokenizer_path, model_max_length=model_max_length
        )
        self.params = params
        self.cfg = cfg
        self.model_max_length = model_max_length
        self.use_text_preprocessing = use_text_preprocessing

    @classmethod
    def from_pretrained(cls, path: str, **kw):
        """Load a local HF flan-t5-xl checkout (weights converted on load)."""
        import jax
        import jax.numpy as jnp
        from transformers import T5EncoderModel

        from controlar_tpu.convert.torch_t5 import convert_t5_state_dict

        model = T5EncoderModel.from_pretrained(path)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16),
            convert_t5_state_dict(model.state_dict(), T5_XL),
        )
        del model
        return cls(params, path, **kw)

    def get_text_embeddings(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        texts = [text_preprocess(t, self.use_text_preprocessing) for t in texts]
        enc = self.tokenizer(
            texts,
            max_length=self.model_max_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])
        emb = t5_encode(self.params, self.cfg, ids, mask)
        return np.asarray(emb, np.float32), np.asarray(mask)
