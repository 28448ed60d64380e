"""Native (C++) runtime components, built on demand with the system g++."""
