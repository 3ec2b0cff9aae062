"""Configuration system (reference: src/core/receiver/{file,in_memory}_configuration.*)."""

from gnss_sdr_tpu.config.configuration import (
    ConfigurationInterface,
    FileConfiguration,
    InMemoryConfiguration,
)

__all__ = ["ConfigurationInterface", "FileConfiguration", "InMemoryConfiguration"]
