"""Datasets, evaluation, misc utilities (analogue of contrib/)."""
