import numpy as np
import jax
import jax.numpy as jnp
import pytest

from straps_tpu.models import (
    build_regressor, make_initial_params_estimate, NUM_OUTPUT_PARAMS,
    torch_state_dict_to_flax, flax_to_torch_state_dict,
)


def count_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def regressor_and_vars():
    mean_pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
    mean_shape = np.zeros(10, np.float32)
    model = build_regressor(mean_pose, mean_shape)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 18)), train=False)
    return model, variables


class TestRegressor:
    def test_output_shapes(self, regressor_and_vars):
        model, variables = regressor_and_vars
        cam, pose, shape = model.apply(variables, jnp.zeros((2, 64, 64, 18)),
                                       train=False)
        assert cam.shape == (2, 3)
        assert pose.shape == (2, 144)
        assert shape.shape == (2, 10)

    def test_param_count_matches_reference(self, regressor_and_vars):
        """Reference: ~11.9M trainable params (BASELINE.md) = 11.22M ResNet18
        (18-ch input, no fc) + 0.69M IEF."""
        _, variables = regressor_and_vars
        n = count_params(variables["params"])
        assert 11_850_000 < n < 12_000_000, n

    def test_zero_input_returns_near_initial_estimate(self, regressor_and_vars):
        """With zero-init fc biases and small random weights, output should
        stay finite and close-ish to the initial estimate."""
        model, variables = regressor_and_vars
        cam, pose, shape = model.apply(variables, jnp.zeros((1, 64, 64, 18)),
                                       train=False)
        out = np.concatenate([np.asarray(cam), np.asarray(pose),
                              np.asarray(shape)], axis=1)
        assert np.all(np.isfinite(out))
        init = make_initial_params_estimate(
            np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24),
            np.zeros(10, np.float32))
        assert out.shape == (1, NUM_OUTPUT_PARAMS)
        # Camera scale starts at 0.9 and deltas are small at init.
        assert abs(out[0, 0] - init[0]) < 0.5

    def test_train_mode_updates_batch_stats(self, regressor_and_vars):
        model, variables = regressor_and_vars
        x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 18)
                        .astype(np.float32))
        _, mutated = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        before = variables["batch_stats"]["encoder"]["bn1"]["mean"]
        after = mutated["batch_stats"]["encoder"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestConvert:
    def test_roundtrip(self, regressor_and_vars):
        """flax -> torch names -> flax must be the identity."""
        _, variables = regressor_and_vars
        torch_sd = flax_to_torch_state_dict(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"]),
             "batch_stats": jax.tree_util.tree_map(np.asarray,
                                                   variables["batch_stats"])})
        # All reference key families must be present.
        keys = set(torch_sd)
        assert "image_encoder.conv1.weight" in keys
        assert "image_encoder.layer1.0.conv1.weight" in keys
        assert "image_encoder.layer2.0.downsample.0.weight" in keys
        assert "ief_module.fc1.weight" in keys
        back = torch_state_dict_to_flax(torch_sd)

        flat_orig = jax.tree_util.tree_leaves_with_path(variables["params"])
        flat_back, _ = jax.tree_util.tree_flatten_with_path(back["params"])
        orig_map = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_orig}
        back_map = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_back}
        assert set(orig_map) == set(back_map)
        for k in orig_map:
            np.testing.assert_allclose(orig_map[k], back_map[k], err_msg=k)

    def test_conv_layout(self, regressor_and_vars):
        _, variables = regressor_and_vars
        torch_sd = flax_to_torch_state_dict(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"])})
        # torch conv1: (64, 18, 7, 7)
        assert torch_sd["image_encoder.conv1.weight"].shape == (64, 18, 7, 7)
        assert torch_sd["ief_module.fc1.weight"].shape == (512, 512 + 157)

    def test_forward_parity_after_roundtrip(self, regressor_and_vars):
        model, variables = regressor_and_vars
        x = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 18)
                        .astype(np.float32))
        ref = model.apply(variables, x, train=False)
        torch_sd = flax_to_torch_state_dict(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"]),
             "batch_stats": jax.tree_util.tree_map(np.asarray,
                                                   variables["batch_stats"])})
        back = torch_state_dict_to_flax(torch_sd)
        got = model.apply({"params": back["params"],
                           "batch_stats": back["batch_stats"]}, x, train=False)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestComputeDtype:
    def test_bf16_encoder_forward_close_to_f32(self):
        import jax
        mean_pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
        mean_shape = np.zeros(10, np.float32)
        from straps_tpu.models import build_regressor
        m32 = build_regressor(mean_pose, mean_shape)
        m16 = build_regressor(mean_pose, mean_shape, compute_dtype="bfloat16")
        variables = m32.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 18)), train=False)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 64, 64, 18).astype(np.float32))
        out32 = m32.apply(variables, x, train=False)
        out16 = m16.apply(variables, x, train=False)
        for a, b in zip(out32, out16):
            # params identical; bf16 activations cost some precision only
            assert a.dtype == jnp.float32 and b.dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0.2, rtol=0.3)
            assert np.all(np.isfinite(np.asarray(b)))


class TestResnet50Regressor:
    def test_r50_roundtrip_and_forward(self):
        """R50 variant: torch-name round-trip (bottleneck conv3/bn3 blocks)
        + forward parity after conversion."""
        mean_pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
        model = build_regressor(mean_pose, np.zeros(10, np.float32),
                                resnet_layers=50)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 18)), train=False)
        sd = flax_to_torch_state_dict(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"]),
             "batch_stats": jax.tree_util.tree_map(
                 np.asarray, variables["batch_stats"])})
        assert "image_encoder.layer1.0.conv3.weight" in sd
        assert "image_encoder.layer1.0.downsample.0.weight" in sd
        assert sd["ief_module.fc1.weight"].shape == (1024, 2048 + 157)
        back = torch_state_dict_to_flax(sd)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 64, 64, 18).astype(np.float32))
        ref = model.apply(variables, x, train=False)
        got = model.apply({"params": back["params"],
                           "batch_stats": back["batch_stats"]}, x, train=False)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestEncoderVariants:
    """Constructor parity with the reference's full torchvision set
    (`models/resnet.py:228-338` — dead code there beyond 18/50, kept as
    constructors here too)."""

    def test_variant_shapes_and_widths(self):
        import jax
        import jax.numpy as jnp
        from straps_tpu.models import (
            resnet34, resnet152, resnext50_32x4d, wide_resnet50_2,
        )

        x = jnp.zeros((1, 64, 64, 3))
        for ctor, dim in ((resnet34, 512), (resnet152, 2048),
                          (resnext50_32x4d, 2048), (wide_resnet50_2, 2048)):
            m = ctor()
            variables = m.init(jax.random.PRNGKey(0), x, train=False)
            out = m.apply(variables, x, train=False)
            assert out.shape == (1, dim), ctor.__name__
        # grouped conv really is grouped: resnext50 3x3 kernels carry
        # in_channels/groups input channels.
        m = resnext50_32x4d()
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        k = v["params"]["layer1_0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 128 // 32, 128), k.shape

    def test_regressor_accepts_all_depths(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from straps_tpu.models import build_regressor

        mean_pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
        for depth in (34, 101):
            m = build_regressor(mean_pose, np.zeros(10, np.float32),
                                resnet_layers=depth)
            v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 18)),
                       train=False)
            cam, pose, shape = m.apply(v, jnp.zeros((1, 64, 64, 18)),
                                       train=False)
            assert cam.shape == (1, 3) and pose.shape == (1, 144)
