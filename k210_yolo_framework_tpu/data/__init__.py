"""Dataset layer: npy annotation format + host loader + on-device preprocessing."""
