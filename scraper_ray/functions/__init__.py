"""Scalar/vector function library: geocode converters, string helpers."""
