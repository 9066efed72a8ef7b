"""Utility layer: coordinates, boxes, logging, timing, constants, config."""
