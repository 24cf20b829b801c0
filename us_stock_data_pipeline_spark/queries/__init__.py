"""Query packages; importing them populates the registry."""
