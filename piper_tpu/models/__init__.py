"""Model families. Currently: VITS (the reference's single family)."""
