"""tracer.scene"""
