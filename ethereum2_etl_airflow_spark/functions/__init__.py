"""Column-expression function library (chain-time math, vector math)."""
