#!/bin/sh
# The marked-slow end-to-end layer (full-registry plan-gate sweep +
# streaming replay e2e), deselected from the default pytest profile so
# the driver's `python -m pytest tests/ -x -q` finishes in budget.
# Run this before shipping a round.
cd "$(dirname "$0")/.." && exec python -m pytest tests/ -m slow -x -q --override-ini 'addopts='
