"""Physical interaction terms: SDF collision, contact attraction/repulsion."""

from homan_tpu.interactions.sdf import (  # noqa: F401
    voxelize_interior_sdf,
    grid_sample_3d,
    sdf_scene_loss,
)
from homan_tpu.interactions.contact import (  # noqa: F401
    batch_pairwise_dist2,
    compute_contact_loss,
    masked_mean_loss,
)
