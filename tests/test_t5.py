"""T5 encoder parity vs HF T5EncoderModel (random tiny config)."""
import numpy as np

import jax
import jax.numpy as jnp

from controlar_tpu.models.t5 import T5Config, t5_encode
from controlar_tpu.convert.torch_t5 import convert_t5_state_dict


def test_t5_encoder_parity():
    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=3,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).float().eval()

    cfg = T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128, n_layer=3, n_head=4)
    params = jax.tree.map(jnp.asarray, convert_t5_state_dict(model.state_dict(), cfg))

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    mask[0, 17:] = 0  # padded caption (ref t5.py right-pads to 120)

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=3e-5)
