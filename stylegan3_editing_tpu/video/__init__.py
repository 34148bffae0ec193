"""Video inversion + editing pipeline (host decode/align, batched TPU
inversion, temporal smoothing, FOV-expanded rendering)."""
