"""Host utilities: synthetic scenes, logging, timers."""
