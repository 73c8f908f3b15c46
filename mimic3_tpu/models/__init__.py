"""Neural model families. Currently: VITS (the Mimic 3 voice architecture)."""
