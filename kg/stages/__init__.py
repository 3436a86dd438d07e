"""Pipeline operators (SURVEY.md §2). Each stage is a pure
``DataFrame → DataFrame`` function; nothing executes until an action."""
