"""Console entry points (installed via pyproject [project.scripts])."""
