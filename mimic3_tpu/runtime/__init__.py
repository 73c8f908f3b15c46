"""Runtime: weight conversion, checkpoints, voice loading, compiled-session
management, and the synthesis scheduler."""
