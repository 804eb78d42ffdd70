"""Post-SCF correlation: MPn, coupled cluster / CI, excited states, stability."""
