"""Tools: imgtool (the reference's regression-test utility) and friends."""
