"""Distributed layer: mesh topology, sampling, exchange, distributed sort."""
