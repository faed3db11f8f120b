"""Pipeline stages: merge -> test -> (popstrat) -> correction -> output."""
