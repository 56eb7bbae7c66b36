"""End-to-end job plans (batch + resume)."""
