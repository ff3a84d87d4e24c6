"""Golden tests for the FULL SincNet configuration space
(/root/reference/models/sincnet.py:256-497) — act_fun zoo, max-pool
strides, dropout, input norms, use_sinc toggle, and the MLP head with its
layer/batch-norm options and control-flow quirks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.models.sincnet_full import (
    MLP,
    SincNetFull,
    import_torch_state,
)

from tests import reference

torch = pytest.importorskip("torch")
reference.add_to_path()

# the reference targets py<3.10 where collections.Sequence existed
import collections, collections.abc  # noqa: E402

if not hasattr(collections, "Sequence"):
    collections.Sequence = collections.abc.Sequence


def _to_numpy_sd(tm):
    return {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


def _allclose(ours, ref, rtol=2e-3, atol_frac=2e-4):
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol_frac * scale)


def _golden_cnn(options, x):
    from models.sincnet import SincNet as TorchSincNet

    tm = TorchSincNet(options)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = SincNetFull(options)
    variables = import_torch_state(_to_numpy_sd(tm), options)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape
    _allclose(ours, ref)


def test_cnn_pool_act_zoo_sinc(rng):
    """max-pool strides + relu/tanh/elu acts + dropout (eval) + sinc front."""
    options = {
        "input_dim": 512, "fs": 25e6,
        "cnn_N_filt": [32, 24, 16, 8],
        "cnn_len_filt": [129, 11, 9, 6],  # even kernel: asymmetric get_pad
        "cnn_max_pool_len": [2, 2, 1, 1],
        "cnn_use_laynorm_inp": False, "cnn_use_batchnorm_inp": False,
        "cnn_use_laynorm": [False] * 4,
        "cnn_use_batchnorm": [True, True, True, True],
        "cnn_act": ["relu", "tanh", "elu", "linear"],
        "cnn_drop": [0.1, 0.1, 0.0, 0.0],
        "use_sinc": True,
    }
    x = rng.standard_normal((2, 512)).astype(np.float32)
    _golden_cnn(options, x)


def test_cnn_no_sinc_softmax_input_bn(rng):
    """use_sinc=False, LogSoftmax-over-channels act, input batchnorm, no
    per-layer norms."""
    options = {
        "input_dim": 256, "fs": 25e6,
        "cnn_N_filt": [16, 12, 4],
        "cnn_len_filt": [31, 9, 7],
        "cnn_max_pool_len": [4, 2, 1],
        "cnn_use_laynorm_inp": False, "cnn_use_batchnorm_inp": True,
        "cnn_use_laynorm": [False] * 3,
        "cnn_use_batchnorm": [False] * 3,
        "cnn_act": ["leaky_relu", "softmax", "sigmoid"],
        "cnn_drop": [0.0, 0.2, 0.0],
        "use_sinc": False,
    }
    x = rng.standard_normal((3, 256)).astype(np.float32)
    _golden_cnn(options, x)


def test_cnn_input_laynorm(rng):
    options = {
        "input_dim": 200, "fs": 25e6,
        "cnn_N_filt": [8, 4],
        "cnn_len_filt": [15, 5],
        "cnn_max_pool_len": [1, 1],
        "cnn_use_laynorm_inp": True, "cnn_use_batchnorm_inp": False,
        "cnn_use_laynorm": [False, False],
        "cnn_use_batchnorm": [False, False],
        "cnn_act": ["relu", "linear"],
        "cnn_drop": [0.0, 0.0],
        "use_sinc": False,
    }
    x = rng.standard_normal((2, 200)).astype(np.float32)
    _golden_cnn(options, x)


def test_cnn_laynorm_path_broken_upstream(rng):
    """The reference's cnn_use_laynorm path indexes self.ln[i] but the
    append is commented out (sincnet.py:440) -> IndexError upstream. Our
    working equivalent of the commented intent stays finite and shaped."""
    options = {
        "input_dim": 128, "fs": 25e6,
        "cnn_N_filt": [8, 4],
        "cnn_len_filt": [65, 5],
        "cnn_max_pool_len": [2, 1],
        "cnn_use_laynorm_inp": False, "cnn_use_batchnorm_inp": False,
        "cnn_use_laynorm": [True, True],
        "cnn_use_batchnorm": [False, False],
        "cnn_act": ["leaky_relu", "linear"],
        "cnn_drop": [0.0, 0.0],
        "use_sinc": True,
    }
    x = rng.standard_normal((2, 128)).astype(np.float32)

    from models.sincnet import SincNet as TorchSincNet

    tm = TorchSincNet(options)
    tm.eval()
    with pytest.raises(IndexError):
        with torch.no_grad():
            tm(torch.from_numpy(x))

    model = SincNetFull(options)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 1, 4 * 64)
    assert np.isfinite(out).all()


MLP_BASE = {
    "input_dim": 48,
    "fc_lay": [48, 32, 16],
    "fc_drop": [0.15, 0.0, 0.0],
    "fc_use_laynorm": [True, False, False],
    "fc_use_batchnorm": [False, True, False],
    "fc_use_laynorm_inp": True,
    "fc_use_batchnorm_inp": False,
    "fc_act": ["leaky_relu", "tanh", "linear"],
}


def _golden_mlp(options, x):
    from models.sincnet import MLP as TorchMLP

    tm = TorchMLP(options)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = MLP(options)
    variables = import_torch_state(_to_numpy_sd(tm), options, mlp=True)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape
    _allclose(ours, ref)


def test_mlp_mixed_norms(rng):
    x = rng.standard_normal((4, 48)).astype(np.float32)
    _golden_mlp(MLP_BASE, x)


def test_mlp_both_norms_quirk(rng):
    """fc_use_laynorm[i] AND fc_use_batchnorm[i] both true: the reference's
    sequential ifs re-apply wx[i] to the first branch's output (only
    shape-valid at equal widths). Control-flow parity check."""
    options = dict(MLP_BASE)
    options.update({
        "input_dim": 32, "fc_lay": [32, 32],
        "fc_drop": [0.0, 0.0],
        "fc_use_laynorm": [True, True],
        "fc_use_batchnorm": [True, True],
        "fc_use_laynorm_inp": False, "fc_use_batchnorm_inp": True,
        "fc_act": ["relu", "linear"],
    })
    x = rng.standard_normal((4, 32)).astype(np.float32)
    _golden_mlp(options, x)


def test_mlp_elu_sigmoid_softmax(rng):
    options = dict(MLP_BASE)
    options.update({
        "fc_use_laynorm": [False] * 3,
        "fc_use_batchnorm": [False] * 3,
        "fc_use_laynorm_inp": False,
        "fc_act": ["elu", "sigmoid", "softmax"],
    })
    x = rng.standard_normal((4, 48)).astype(np.float32)
    _golden_mlp(options, x)


def test_cnn_train_mode_updates_stats_and_droput_masks(rng):
    """Train mode: batch_stats move, dropout actually masks."""
    options = {
        "input_dim": 128, "fs": 25e6,
        "cnn_N_filt": [8, 4],
        "cnn_len_filt": [33, 5],
        "cnn_max_pool_len": [1, 1],
        "cnn_use_laynorm_inp": False, "cnn_use_batchnorm_inp": False,
        "cnn_use_laynorm": [False, False],
        "cnn_use_batchnorm": [True, True],
        "cnn_act": ["leaky_relu", "linear"],
        "cnn_drop": [0.5, 0.0],
        "use_sinc": True,
    }
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    model = SincNetFull(options)
    variables = model.init(jax.random.PRNGKey(0), x)

    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))

    out2, _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_export_round_trip_to_torch(rng):
    """From-scratch flax init -> export_torch_state -> torch reference model
    loads it and matches our forward (reverse interop for the full space)."""
    from stofnet_tpu.models.sincnet_full import export_torch_state

    options = {
        "input_dim": 256, "fs": 25e6,
        "cnn_N_filt": [16, 8],
        "cnn_len_filt": [65, 7],
        "cnn_max_pool_len": [2, 1],
        "cnn_use_laynorm_inp": False, "cnn_use_batchnorm_inp": True,
        "cnn_use_laynorm": [False, False],
        "cnn_use_batchnorm": [True, False],
        "cnn_act": ["leaky_relu", "linear"],
        "cnn_drop": [0.0, 0.0],
        "use_sinc": True,
    }
    x = rng.standard_normal((2, 256)).astype(np.float32)
    model = SincNetFull(options)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
          for k, v in export_torch_state(variables, options).items()}

    from models.sincnet import SincNet as TorchSincNet

    tm = TorchSincNet(options)
    missing, unexpected = tm.load_state_dict(
        {k: v for k, v in sd.items() if "num_batches_tracked" not in k},
        strict=False)
    assert not unexpected
    # torch registers a BatchNorm module for EVERY layer regardless of its
    # use flag (sincnet.py:441); unused ones never run in forward, so they
    # may legitimately be absent from our export
    unused_bn = {i for i, on in enumerate(options["cnn_use_batchnorm"])
                 if not on}
    for k in missing:
        assert ("num_batches_tracked" in k
                or (k.startswith("bn.") and int(k.split(".")[1]) in unused_bn))
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    _allclose(ours, ref)
