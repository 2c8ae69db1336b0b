"""Device-side primitive ops: sampling, scatter render, labeling, NMS."""
