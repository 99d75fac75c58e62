"""Application-layer utilities (analogue of the reference's contrib/)."""
