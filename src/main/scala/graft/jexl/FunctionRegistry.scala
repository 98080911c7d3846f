package graft.jexl

import org.apache.spark.sql.Column

/** Pluggable JEXL function-namespace SPI — the
  * JexlFunctionNamespaceRegistry / JexlFunctionArgumentDescriptorFactory
  * analog (jexl/functions Descriptor classes): deployments register extra
  * namespaces without touching the compiler. The built-in namespaces
  * (`filter:`/`f:`/`content:`/`grouping:`/`geo:`/`geowave:`) resolve
  * first; the registry is the fallback for everything else.
  *
  * A handler gets the compile context (field resolution, typed literals)
  * and the raw argument list, and returns the predicate Column — the
  * "descriptor" side (index-query generation) is Catalyst's job once the
  * Column is declarative.
  */
object FunctionRegistry {

  type Handler = (FunctionContext, List[Node.Arg]) => Column

  /** The slice of the compiler context exposed to custom functions. */
  trait FunctionContext {
    /** exists-any over model expansion and array elements. */
    def anyField(field: String)(pred: (Column, org.apache.spark.sql.types.DataType) => Column): Column
    /** first resolved column for a field. */
    def single(field: String): Column
    def fieldType(field: String): Option[org.apache.spark.sql.types.DataType]
  }

  private val handlers =
    scala.collection.concurrent.TrieMap.empty[(String, String), Handler]

  /** Register `ns:name(...)`; later registrations win (latest deploy). */
  def register(ns: String, name: String, h: Handler): Unit =
    handlers.put((ns.toLowerCase, name.toLowerCase), h)

  def unregister(ns: String, name: String): Unit =
    handlers.remove((ns.toLowerCase, name.toLowerCase))

  private[jexl] def lookup(ns: String, name: String): Option[Handler] =
    handlers.get((ns.toLowerCase, name.toLowerCase))
}
