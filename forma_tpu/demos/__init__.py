"""Demo scenes and apps (the counterpart of the reference's `demo/` crate)."""
