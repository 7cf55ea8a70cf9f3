"""Runtime utilities: image IO, timing/profiling, native host bindings."""
