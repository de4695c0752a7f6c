"""Device programs ("models"): fused, jittable pipelines built from
topsicle_tpu.ops primitives."""

from topsicle_tpu.models.telomere import TelomereScanModel  # noqa: F401
