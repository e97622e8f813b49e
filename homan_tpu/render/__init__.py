"""Differentiable TPU rasterization (silhouette / depth / flat-shaded RGB)."""

from homan_tpu.render.rasterizer import (  # noqa: F401
    rasterize_soft,
    rasterize_depth,
    rasterize_hard,
    project_ndc,
    RasterSettings,
)
