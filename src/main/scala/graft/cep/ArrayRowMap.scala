package graft.cep

/** Read-optimized `Map[String, Any]` view over a positional value array,
  * sharing one name→index table across all rows of a partition.
  *
  * The CEP matcher evaluates DEFINE/MEASURES against every buffered row;
  * materializing a real `HashMap` per row costs an allocation + per-field
  * boxing churn per input row (the dominant cost of the batch CEP path at
  * 100k+ rows/partition-set). Row maps are read-only throughout
  * [[Matcher]]/[[RowEval]]; the rare structural update falls back to a
  * real map copy.
  */
final class ArrayRowMap(
    idx: java.util.HashMap[String, Integer],
    names: Array[String],
    vals: Array[Any])
  extends scala.collection.immutable.Map[String, Any] with Serializable {

  override def get(key: String): Option[Any] = {
    val i = idx.get(key)
    if (i == null) None else Some(vals(i))
  }
  override def apply(key: String): Any = {
    val i = idx.get(key)
    if (i == null) throw new NoSuchElementException(key) else vals(i)
  }
  override def contains(key: String): Boolean = idx.containsKey(key)
  override def size: Int = names.length
  override def iterator: Iterator[(String, Any)] =
    names.iterator.zipWithIndex.map { case (n, i) => n -> vals(i) }

  private def real: Map[String, Any] = iterator.toMap
  override def removed(key: String): Map[String, Any] = real.removed(key)
  override def updated[V1 >: Any](key: String, value: V1): Map[String, V1] =
    real.updated(key, value)
}

object ArrayRowMap {
  def index(names: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](names.length * 2)
    var i = 0
    while (i < names.length) { m.put(names(i), i); i += 1 }
    m
  }
}
