"""ResNet-IR backbone: shape checks + numerical parity vs the reference torch
implementation with transferred weights (reference nets/resnet.py)."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.numpy as jnp

from fr_tpu.configs.base import Config
from fr_tpu.models.resnet import ResNet, build_resnet


def small_conf(network="ResNet18", mixed_precision=False):
    return Config(network=network, emd_size=512, mixed_precision=mixed_precision)


def test_resnet18_shapes_and_param_structure():
    enc = build_resnet(small_conf())
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=True)
    emb, updates = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert emb.shape == (2, 512)
    assert emb.dtype == jnp.float32
    # eval mode, no mutation
    emb2 = enc.apply(variables, x, train=False)
    assert emb2.shape == (2, 512)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_resnet18_matches_reference_torch():
    add_reference_to_path()
    import torch
    from nets.resnet import ResNet18 as RefResNet18

    from fr_tpu.utils.torch_import import resnet_from_torch

    conf = small_conf("ResNet18")
    torch.manual_seed(0)
    ref = RefResNet18(Config(emd_size=512))
    ref.eval()

    params, batch_stats = resnet_from_torch(ref.state_dict(), "ResNet18")

    enc = build_resnet(conf)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 112, 112)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    # sanity: transferred tree must match the init tree structurally
    init_vars = enc.init(jax.random.key(0), x_nhwc, train=False)
    chex = jax.tree.structure(init_vars["params"])
    assert jax.tree.structure(jax.tree.map(jnp.asarray, params)) == chex

    out = enc.apply({"params": params, "batch_stats": batch_stats},
                    x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_resnet18_train_mode_matches_reference_torch():
    """Train-mode forward (batch stats) must also agree — this checks BN
    batch-statistics semantics, not just running-stat inference."""
    add_reference_to_path()
    import torch
    from nets.resnet import ResNet18 as RefResNet18

    from fr_tpu.utils.torch_import import resnet_from_torch

    torch.manual_seed(1)
    ref = RefResNet18(Config(emd_size=512))
    ref.train()
    params, batch_stats = resnet_from_torch(ref.state_dict(), "ResNet18")
    enc = build_resnet(small_conf("ResNet18"))

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out, _ = enc.apply({"params": params, "batch_stats": batch_stats},
                       x_nhwc, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-2, atol=1e-2)
