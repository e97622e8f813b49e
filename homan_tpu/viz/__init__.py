"""Visualization: overlay renders, top-down views, video/report writers."""
