"""MCP (Model Context Protocol) serving layer."""
