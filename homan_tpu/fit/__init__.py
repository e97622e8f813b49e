"""Optimization core: parameter pytrees, loss library, stage-B pose init,
stage-C joint fitting."""
