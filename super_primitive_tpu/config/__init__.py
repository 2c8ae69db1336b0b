"""Strict typed configuration with reference-YAML compatibility."""

from .schema import Config, load_config, to_dict

__all__ = ["Config", "load_config", "to_dict"]
