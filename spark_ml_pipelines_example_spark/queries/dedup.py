"""(round-1 WIP) — populated in a later commit this round."""
