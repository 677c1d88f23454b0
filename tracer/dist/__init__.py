"""tracer.dist"""
