"""HF ViT weight conversion parity: DeiTModel(config) vs flax ViT."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_cloud_reid_tpu.convert.hf_vit import convert_hf_vit_state_dict  # noqa: E402
from point_cloud_reid_tpu.models.vit import ViT  # noqa: E402


def _tiny_deit_config(image_size=64):
    from transformers import DeiTConfig
    return DeiTConfig(hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      image_size=image_size, patch_size=16,
                      attention_probs_dropout_prob=0.0,
                      hidden_dropout_prob=0.0)


def test_deit_conversion_parity():
    from transformers import DeiTModel
    torch.manual_seed(0)
    cfg = _tiny_deit_config()
    hf = DeiTModel(cfg).eval()

    fvit = ViT(dim=32, depth=2, heads=2, patch=16, image_size=64,
               dist_token=True, final_norm=False, mlp_ratio=2.0)
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    variables = fvit.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    new_params, unmatched = convert_hf_vit_state_dict(sd, variables["params"])
    # pooler + final layernorm are dead for the DeiT tap (hidden_states[-1])
    assert all("pooler" in k or "layernorm." in k for k in unmatched), unmatched

    with torch.no_grad():
        ref = hf(torch.from_numpy(x), output_hidden_states=True
                 ).hidden_states[-1].numpy()
    got = np.asarray(fvit.apply({"params": new_params}, jnp.asarray(x),
                                train=False))
    assert got.shape == ref.shape                     # (2, 2 + 16, 32)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_beit_conversion_parity():
    from transformers import BeitConfig, BeitModel
    torch.manual_seed(1)
    cfg = BeitConfig(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     image_size=64, patch_size=16,
                     use_shared_relative_position_bias=True,
                     use_relative_position_bias=False,
                     use_mean_pooling=False,
                     layer_scale_init_value=0.1,
                     attention_probs_dropout_prob=0.0,
                     hidden_dropout_prob=0.0, drop_path_rate=0.0)
    hf = BeitModel(cfg, add_pooling_layer=False).eval()

    fvit = ViT(dim=32, depth=2, heads=2, patch=16, image_size=64,
               dist_token=False, rel_pos_bias=True, layer_scale=True,
               final_norm=True, mlp_ratio=2.0)
    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    variables = fvit.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    new_params, unmatched = convert_hf_vit_state_dict(sd, variables["params"])
    assert not unmatched, unmatched

    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(fvit.apply(
        {"params": new_params, "consts": variables["consts"]},
        jnp.asarray(x), train=False))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
