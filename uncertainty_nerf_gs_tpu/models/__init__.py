"""Models: ray sampling / projection + compositing + losses."""
