"""Experiment drivers (reference: scripts_training/*.py argparse mains)."""
