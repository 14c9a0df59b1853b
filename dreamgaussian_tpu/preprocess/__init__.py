"""Host-side input preprocessing models (L0 of the layer map)."""
