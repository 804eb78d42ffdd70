"""Calculation drivers: single-point energies, optimisation, frequencies,
molecular dynamics, scans and composite calculations."""
