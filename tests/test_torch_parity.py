"""Numerical parity between the flax regressor and a torch execution of the
same weights (SURVEY.md §7 hard part 3: torch-numerics parity for checkpoint
compatibility).

The torch model below is built *generatively* (module dict keyed by the
reference state-dict names) purely as a test oracle: loading our exported
state dict with strict=True proves name/shape compatibility with the
reference checkpoint format, and output agreement proves the architectures
(padding, BN eps, pooling, IEF loop) match to float precision.
"""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from straps_tpu.models import (  # noqa: E402
    build_regressor, flax_to_torch_state_dict, make_initial_params_estimate,
)


def build_torch_regressor(in_channels=18):
    """Torch twin of SingleInputRegressor (ResNet-18 + IEF), with the
    reference's state-dict naming."""
    nn = torch.nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            widths = [64, 128, 256, 512]
            cin = 64
            for s, w in enumerate(widths):
                blocks = []
                for b in range(2):
                    stride = (1 if s == 0 or b > 0 else 2)
                    blocks.append(Block(cin, w, stride))
                    cin = w
                setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for s in range(1, 5):
                x = getattr(self, f"layer{s}")(x)
            return x.mean(dim=(2, 3))

    class IEF(nn.Module):
        def __init__(self, init_estimate):
            super().__init__()
            self.fc1 = nn.Linear(512 + 157, 512)
            self.fc2 = nn.Linear(512, 512)
            self.fc3 = nn.Linear(512, 157)
            self.register_buffer("init_estimate",
                                 torch.from_numpy(init_estimate))

        def forward(self, feats):
            params = self.init_estimate.repeat(feats.shape[0], 1)
            for _ in range(3):
                state = torch.cat([feats, params], dim=1)
                delta = self.fc3(torch.relu(self.fc2(torch.relu(
                    self.fc1(state)))))
                params = params + delta
            return params[:, :3], params[:, 3:147], params[:, 147:]

    class Regressor(nn.Module):
        def __init__(self):
            super().__init__()
            init = make_initial_params_estimate(
                np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24),
                np.zeros(10, np.float32))
            self.image_encoder = Encoder()
            self.ief_module = IEF(init)

        def forward(self, x):
            return self.ief_module(self.image_encoder(x))

    return Regressor()


class TestTorchParity:
    def test_forward_parity(self):
        mean_pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
        model = build_regressor(mean_pose, np.zeros(10, np.float32))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 18)), train=False)
        sd = flax_to_torch_state_dict(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"]),
             "batch_stats": jax.tree_util.tree_map(
                 np.asarray, variables["batch_stats"])})
        tmodel = build_torch_regressor()
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
        missing, unexpected = tmodel.load_state_dict(tsd, strict=False)
        # Only BN bookkeeping + the IEF init buffer may be absent.
        assert all("num_batches_tracked" in m or "init_estimate" in m
                   for m in missing), missing
        assert not unexpected, unexpected
        tmodel.eval()

        x = np.random.RandomState(0).randn(2, 64, 64, 18).astype(np.float32)
        cam_j, pose_j, shape_j = model.apply(variables, jnp.asarray(x),
                                             train=False)
        with torch.no_grad():
            cam_t, pose_t, shape_t = tmodel(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(cam_j), cam_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(pose_j), pose_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(shape_j), shape_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
