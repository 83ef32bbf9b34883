"""configs subpackage."""
