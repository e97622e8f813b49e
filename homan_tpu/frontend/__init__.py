"""Host-side evidence preparation: masks, crops, occlusion targets, caches."""
