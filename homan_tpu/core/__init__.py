"""Core math: rotations, cameras, bounding boxes, the MANO hand model, meshes."""
