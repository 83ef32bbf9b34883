"""Data layer: dataparsers, datamanagers, corruption, synthetic scenes."""
