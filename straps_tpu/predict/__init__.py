"""Inference: proxy construction + batched prediction rollout."""

from straps_tpu.predict.proxy import (
    silhouette_joints_to_proxy, batch_silhouettes_joints_to_proxies,
    densepose_iuv_to_silhouette,
)
from straps_tpu.predict.pipeline import (
    make_predict_fn, load_cached_proxies, load_regressor_variables,
    predict_3d, resolve_heatmap_mode,
)

__all__ = [
    "silhouette_joints_to_proxy", "batch_silhouettes_joints_to_proxies",
    "densepose_iuv_to_silhouette", "make_predict_fn", "load_cached_proxies",
    "load_regressor_variables", "predict_3d", "resolve_heatmap_mode",
]
