"""PySpark-native analytics engine with the query/data-processing
capabilities of ``everwatchsolutions/aces-nifi-processors-bundle``.

The reference is an Apache NiFi custom-processor bundle (record-at-a-
time dataflow operators); this package re-expresses every operator as
idiomatic, Catalyst-optimizable PySpark DataFrame transforms:

- ``operators.attributes_to_json`` — typed projection of string
  attributes (ref: BetterAttributesToJSON.java)
- ``operators.security_marking`` — classification-marking parsing into
  a nested struct (ref: ConvertSecurityMarkingAndAttrListIntoJson.java)
- ``operators.binning`` — multi-dimensional binning/counting
  (ref: DataBinningProcessor.java)
- ``operators.partial_update`` — keyed partial upsert/merge with
  $set/$addToSet/$inc/$currentDate semantics (ref: PartialUpdateMongo.java)
- ``operators.put_if_absent`` — insert with duplicate detection
  (ref: PutMongoWithDuplicateCheck.java)
- ``sinks.socketio`` — push sink (ref: SocketIOProcessor.java)
- ``pipeline.*`` — large-scale training-data pipeline extensions
  (dedup, similarity search, text analysis, multimodal plumbing)

Design stance: DataFrame/SQL first, explicit config dataclasses, zero
Python UDFs on hot paths, Structured Streaming as a thin mode over the
same transforms.
"""

__version__ = "0.1.0"
