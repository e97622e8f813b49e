"""Device-mesh parallelism: clip data-parallelism (parallel/clips.py),
frame-axis sequence parallelism for one long clip (parallel/frames.py), and
multi-host deployment glue (parallel/multihost.py)."""
