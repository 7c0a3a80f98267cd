"""Input data models (the rebuilt generator suite: uniform, Zipf, ...)."""
