"""Compute-path building blocks (trace-time planners + jnp/Pallas ops)."""
