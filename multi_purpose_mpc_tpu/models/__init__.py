"""Vehicle models: spatial bicycle model and state pytrees."""
