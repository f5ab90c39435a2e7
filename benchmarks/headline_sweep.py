"""Serving-point sweep + roofline for the bench.py headline program.

Sweeps the proxy->SMPL inference pipeline (flagship ResNet-18 + IEF x3 +
full SMPL forward, `run_predict.py` semantics) over batch x compute-dtype x
input-dtype x buffer-donation on the real TPU, and normalises each point
against the XLA cost model (FLOPs, HBM bytes -> achieved TF/s, %MXU, GB/s,
%HBM, arithmetic intensity, bound-by) — the denominator VERDICT r4 weak #2
asked for under README's "bandwidth-bound" claim.

Tunnel-aware measurement discipline:
- host-pull completion barrier (block_until_ready is unreliable on the
  tunneled backend);
- best-of-R rate over R timed blocks — the MAX rate is the device
  capability, the spread is the tunnel;
- the proxy batch is uploaded ONCE as packed uint8 (it is a binary mask
  stack) and materialised to f32/bf16 by an on-device cast, so sweep points
  don't each pay a multi-GB tunnel upload;
- donated runs feed a fresh on-device copy each call (a jitted identity,
  ~2 ms/GB at HBM rate) because donation consumes the input buffer — this
  models the real pipeline, where every step hands the program a new batch
  buffer, without timing the tunnel.

Usage: python benchmarks/headline_sweep.py [iters] [repeats]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_stages import (           # noqa: E402
    RIDGE, V5E_HBM_BPS, V5E_PEAK_FLOPS, cost_counts,
)


def build_forward(compute_dtype, donate):
    import jax
    import jax.numpy as jnp
    from straps_tpu.geometry import rot6d_to_rotmat
    from straps_tpu.models import build_regressor
    from straps_tpu.smpl import load_synthetic_assets, smpl_forward

    assets = load_synthetic_assets()
    model = build_regressor(assets.mean_pose_6d, assets.mean_shape,
                            compute_dtype=compute_dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 18)), train=False)

    def forward(variables, assets_dev, proxy):
        cam, pose6d, shape = model.apply(variables, proxy, train=False)
        rm = rot6d_to_rotmat(pose6d.reshape(proxy.shape[0], 24, 6))
        out = smpl_forward(assets_dev, shape, rm[:, 1:], rm[:, 0:1])
        reposed = smpl_forward(assets_dev, shape)
        return out.vertices, out.joints, reposed.vertices, cam

    # donate_argnums=2 donates the proxy input: the (B, 256, 256, 18)
    # activation is the largest live buffer (9.7 GB at B=2048 f32) and the
    # network never reads it after the stem conv — donation lets XLA reuse
    # that HBM for activations.
    jitted = jax.jit(forward, donate_argnums=(2,) if donate else ())
    return jitted, variables, assets


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)

    # (batch, compute_dtype, input_dtype, donate) sweep grid.  f32 input at
    # B=2048 is structurally out of HBM (9.7 GB input + 8.6 GB stem
    # activations > 16 GB), so 2048 runs bf16-input only.
    grid = [
        (512, None, "float32", False),
        (512, "bfloat16", "float32", False),
        (512, "bfloat16", "bfloat16", False),
        (512, "bfloat16", "float32", True),
        (1024, "bfloat16", "float32", False),
        (1024, "bfloat16", "bfloat16", False),
        (1024, "bfloat16", "bfloat16", True),
        # The proxy is a binary mask stack: uint8 input is value-exact and
        # quarters the stem's HBM read vs f32 (flax promotes to the conv
        # compute dtype on chip).
        (512, "bfloat16", "uint8", False),
        (1024, "bfloat16", "uint8", False),
        (1536, "bfloat16", "bfloat16", False),
        (2048, "bfloat16", "bfloat16", False),
        (2048, "bfloat16", "bfloat16", True),
    ]

    results = []
    uploaded = {}
    for batch, cdtype, idtype, donate in grid:
        if batch not in uploaded:
            mask = (rng.rand(batch, 256, 256, 18) < 0.02).astype(np.uint8)
            uploaded[batch] = jax.device_put(jnp.asarray(mask), dev)
        base_u8 = uploaded[batch]
        tag = {"batch": batch, "dtype": cdtype or "float32",
               "input_dtype": idtype, "donate": donate}
        try:
            cast = jax.jit(lambda x, d=idtype: x.astype(d))
            proxy = cast(base_u8)
            _ = np.asarray(proxy[0, 0, 0, 0])
            fresh = jax.jit(lambda x: x + 0)     # on-device buffer copy
            jitted, variables, assets = build_forward(cdtype, donate)
            variables = jax.device_put(variables, dev)
            assets_dev = jax.device_put(assets, dev)

            def call():
                p = fresh(proxy) if donate else proxy
                return jitted(variables, assets_dev, p)

            _ = np.asarray(call()[3])                       # warmup
            best = 0.0
            for _ in range(repeats):
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = call()
                _ = np.asarray(out[3])
                best = max(best,
                           batch * iters / (time.perf_counter() - t0))
            counts = cost_counts(jitted, variables, assets_dev, proxy)
            row = dict(tag, inf_per_s=round(best, 1))
            if counts:
                flops, nbytes = counts
                t_inf = 1.0 / best                    # s per inference
                ai = flops / max(nbytes, 1.0)
                row.update({
                    "gflop_per_inf": round(flops / batch / 1e9, 3),
                    "hbm_mb_per_inf": round(nbytes / batch / 1e6, 2),
                    "achieved_tflops": round(flops / batch / t_inf / 1e12,
                                             2),
                    "pct_mxu": round(flops / batch / t_inf
                                     / V5E_PEAK_FLOPS * 100, 1),
                    "achieved_gbps": round(nbytes / batch / t_inf / 1e9, 1),
                    "pct_hbm": round(nbytes / batch / t_inf
                                     / V5E_HBM_BPS * 100, 1),
                    "ai": round(ai, 1),
                    "bound": "compute" if ai >= RIDGE else "bandwidth",
                })
            print(json.dumps(row), flush=True)
            results.append(row)
        except Exception as e:  # noqa: BLE001 — record OOM/compile failures
            print(json.dumps(dict(tag, error=f"{type(e).__name__}: "
                                  f"{str(e)[:200]}")), flush=True)

    if results:
        best = max(results, key=lambda r: r["inf_per_s"])
        print(f"\nbest point: {json.dumps(best)}")


if __name__ == "__main__":
    main()
