"""Developer tools: experiment-corpus generation, sweep launching."""
