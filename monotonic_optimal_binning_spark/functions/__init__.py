"""Column-level helper functions (labels, vector math)."""
