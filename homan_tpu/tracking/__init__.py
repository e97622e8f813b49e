"""Host-side box tracking: Kalman filtering, RTS smoothing, sequence tracks."""
