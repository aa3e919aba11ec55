"""placeholder — filled in this round."""
