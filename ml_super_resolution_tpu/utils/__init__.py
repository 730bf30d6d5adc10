"""Config, logging, and misc framework plumbing."""
