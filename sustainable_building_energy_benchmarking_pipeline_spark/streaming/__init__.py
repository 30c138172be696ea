# streaming: Structured Streaming extension of the HVAC detection pipeline
