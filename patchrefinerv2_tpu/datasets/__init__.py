"""Dataset registry imports (populated by the data-layer milestone)."""
