"""homan_tpu — TPU-native joint hand-object reconstruction from RGB video.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
optimization pipeline (hassony2/homan): given per-frame 2D evidence (hand/object
masks, hand keypoints, MANO initializations), it fits MANO hand pose and object
6DoF pose jointly over a clip with silhouette, keypoint, temporal-smoothness and
physical interaction losses.

Architecture (TPU-first, not a port):
  * all optimizable state lives in parameter pytrees (no stateful modules);
  * the optimizer loops are `lax.scan`s compiled once per shape bucket;
  * frames and pose candidates are `vmap` batch axes;
  * clips shard data-parallel over a `jax.sharding.Mesh`;
  * the differentiable silhouette/depth renderer is a tiled rasterizer whose
    inner products run on the MXU (see homan_tpu.render);
  * mesh->SDF voxelization is a dense point-grid formulation (homan_tpu.interactions).

Layer map:
  core/          geometry, cameras, bboxes, MANO hand model, mesh utils
  render/        differentiable tiled rasterizer (silhouette / depth / RGB)
  interactions/  SDF collision + contact losses
  fit/           loss library, stage-B pose initializer, stage-C joint fit
  frontend/      host-side evidence preparation (masks, crops, occlusion targets)
  tracking/      Kalman/RTS box smoothing, sequence tracking
  data/          dataset shells, chunking, collation, mesh loading
  eval/          point metrics, chunk interpolation, reporting
  parallel/      device-mesh sharding of independent clips
  cli/           fit_vid_dataset / track_dataset / evalho3d drivers
"""

__version__ = "0.1.0"
